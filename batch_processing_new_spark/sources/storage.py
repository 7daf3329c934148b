"""Object-store URL mapping: reference-style S3 addressing -> Spark s3a.

The reference addresses its input as a presigned/public HTTPS URL that
pandas streams directly (``pd.read_csv(csv_url)``, test.py:170) and
writes its output with ``boto3 put_object`` + a public-read ACL
(test.py:248-253). Spark's Hadoop-FS world speaks neither presigned
HTTPS nor boto3 — its S3 dialect is the ``s3a://`` filesystem configured
through ``fs.s3a.*``. This module is the translation layer:

- ``s3://bucket/key`` and ``s3n://`` -> ``s3a://bucket/key``
- virtual-hosted HTTPS (``https://bucket.s3.us-east-1.amazonaws.com/key``)
  and path-style HTTPS (``https://s3.us-east-1.amazonaws.com/bucket/key``)
  -> ``s3a://bucket/key`` (+ region endpoint conf); an ``X-Amz-``
  query marks a presigned URL — the signature cannot be forwarded to
  s3a (it signs a single GET, not ranged splits), so presigned URLs
  keep their FULL signed form and the pipeline streams the single
  object over HTTP driver-side (the reference's own model,
  test.py:170; fine for one CSV, wrong for 100 TB — at scale, grant
  credentials and address the bucket directly)
- anything else (local paths, ``file://``, ``hdfs://``) passes through

Mapping is pure string work — unit-testable with no AWS anywhere
(tests/test_storage_mapping.py). ``apply_s3a_conf`` sets the bare
``fs.s3a.*`` keys on the context's LIVE Hadoop configuration (runtime
``spark.conf.set`` of ``spark.hadoop.*`` keys never reaches the
filesystem); credentials stay OUT of this module: s3a's default
provider chain reads the standard env/instance metadata itself.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

# virtual-hosted: bucket.s3.amazonaws.com or bucket.s3.<region>.amazonaws.com
_VHOST_RE = re.compile(
    r"^(?P<bucket>[a-z0-9][a-z0-9.-]{1,61}[a-z0-9])\.s3(?:[.-](?P<region>[a-z0-9-]+))?\.amazonaws\.com$"
)
# path-style: s3.amazonaws.com or s3.<region>.amazonaws.com
_PATH_RE = re.compile(r"^s3(?:[.-](?P<region>[a-z0-9-]+))?\.amazonaws\.com$")


@dataclass(frozen=True)
class MappedSource:
    """A storage URL resolved for Spark consumption."""

    path: str                      # what spark.read/write should address
    conf: dict[str, str] = field(default_factory=dict)  # fs.s3a.* session conf
    presigned: bool = False        # True: auth lives in the (dropped) query
    scheme: str = "file"           # normalized scheme family


def map_url(url: str) -> MappedSource:
    """Resolve any reference-accepted storage URL to a Spark path + conf."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()

    if scheme in ("s3", "s3a", "s3n"):
        return MappedSource(
            path=f"s3a://{parts.netloc}{parts.path}", scheme="s3a"
        )

    if scheme in ("http", "https"):
        host = parts.hostname or ""
        presigned = "x-amz-" in (parts.query or "").lower()
        if presigned:
            # the signature signs a single GET and cannot be forwarded
            # to s3a (which issues ranged reads with its own auth) —
            # keep the FULL signed URL and let the caller stream it
            # over HTTP, exactly the reference's own access model
            # (pd.read_csv(csv_url), test.py:170)
            return MappedSource(path=url, presigned=True, scheme=scheme)
        m = _VHOST_RE.match(host)
        if m:
            bucket, region = m.group("bucket"), m.group("region")
            conf = _region_conf(region)
            return MappedSource(
                path=f"s3a://{bucket}{parts.path}",
                conf=conf,
                scheme="s3a",
            )
        m = _PATH_RE.match(host)
        if m:
            key_path = parts.path.lstrip("/")
            bucket, _, key = key_path.partition("/")
            conf = _region_conf(m.group("region"))
            return MappedSource(
                path=f"s3a://{bucket}/{key}",
                conf=conf,
                scheme="s3a",
            )
        # plain HTTP(S) that is not S3: keep as-is (the HTTP streaming
        # fallback reads it driver-side, reference-parity for one CSV)
        return MappedSource(path=url, scheme=scheme)

    # local path / file:// / hdfs:// / abfs:// ... — untouched
    return MappedSource(path=url, scheme=scheme or "file")


def _region_conf(region: str | None) -> dict[str, str]:
    if not region:
        return {}
    return {"fs.s3a.endpoint": f"s3.{region}.amazonaws.com"}


#: conf for the reference's ``ACL='public-read'`` put_object
#: (test.py:248-253) — the s3a equivalent is a canned ACL on new objects.
PUBLIC_READ_CONF = {"fs.s3a.acl.default": "PublicRead"}


def fetch_http_to_local(url: str, timeout: int = 200) -> str:
    """Stream an HTTP(S) object to a local temp file and return its
    path — the driver-side single-object read the reference performs
    (``pd.read_csv(csv_url)``, test.py:170). Used for presigned S3 and
    plain-HTTPS inputs, which no Hadoop filesystem can address; bounded
    by one CSV of reference scale, never a data-plane path.
    """
    import atexit
    import os
    import shutil
    import tempfile
    import urllib.request

    fd, local = tempfile.mkstemp(suffix=".csv", prefix="http_src_")
    with urllib.request.urlopen(url, timeout=timeout) as resp, open(
        fd, "wb"
    ) as out:
        shutil.copyfileobj(resp, out)
    # the file must outlive this call (the Spark scan is lazy and may
    # re-read it), so cleanup is deferred to process exit — a
    # long-running service otherwise leaks one CSV copy per job
    atexit.register(lambda p=local: os.path.exists(p) and os.remove(p))
    return local


def apply_s3a_conf(spark, mapped: MappedSource, public_read: bool = False):
    """Apply a MappedSource's fs.s3a conf to the session (idempotent).

    Keys go on the SparkContext's live Hadoop configuration with their
    BARE ``fs.s3a.*`` names: ``spark.conf.set("spark.hadoop.fs...")``
    at runtime is silently inert — SessionState.newHadoopConf copies
    SQLConf entries verbatim (the ``spark.hadoop.`` prefix is only
    stripped from the SparkConf at SparkContext STARTUP), so the
    endpoint/ACL would never reach the s3a filesystem.
    """
    conf = dict(mapped.conf)
    if public_read:
        conf.update(PUBLIC_READ_CONF)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)
    return mapped.path
