"""URL-mapping logic for S3 addressing (sources/storage.py) — pure
string tests, no AWS anywhere. Reference parity: presigned HTTPS input
(test.py:170) and put_object public-read output (test.py:248-253)."""

from __future__ import annotations

from batch_processing_new_spark.sources.storage import (
    PUBLIC_READ_CONF,
    map_url,
)


def test_s3_uri_maps_to_s3a():
    m = map_url("s3://my-bucket/some/key.csv")
    assert m.path == "s3a://my-bucket/some/key.csv"
    assert m.scheme == "s3a" and not m.presigned and m.conf == {}


def test_s3n_and_s3a_normalize():
    assert map_url("s3n://b/k").path == "s3a://b/k"
    assert map_url("s3a://b/k").path == "s3a://b/k"


def test_virtual_hosted_https_with_region():
    m = map_url("https://my-bucket.s3.us-west-2.amazonaws.com/dir/f.csv")
    assert m.path == "s3a://my-bucket/dir/f.csv"
    assert m.conf == {
        "fs.s3a.endpoint": "s3.us-west-2.amazonaws.com"
    }
    assert not m.presigned


def test_virtual_hosted_https_global_endpoint():
    m = map_url("https://my-bucket.s3.amazonaws.com/f.csv")
    assert m.path == "s3a://my-bucket/f.csv"
    assert m.conf == {}


def test_path_style_https():
    m = map_url("https://s3.eu-central-1.amazonaws.com/bkt/a/b.csv")
    assert m.path == "s3a://bkt/a/b.csv"
    assert m.conf == {
        "fs.s3a.endpoint": "s3.eu-central-1.amazonaws.com"
    }


def test_presigned_url_flagged_and_query_dropped():
    m = map_url(
        "https://bkt.s3.us-east-1.amazonaws.com/k.csv"
        "?X-Amz-Algorithm=AWS4-HMAC-SHA256&X-Amz-Signature=abc"
    )
    assert m.presigned is True
    # the signed URL survives INTACT: the signature authorizes exactly
    # one GET, so the pipeline streams it over HTTP instead of s3a
    assert m.path.startswith("https://bkt.s3.us-east-1.amazonaws.com/k.csv?")
    assert "X-Amz-Signature=abc" in m.path
    assert m.scheme == "https"


def test_non_s3_https_passes_through():
    url = "https://example.com/data.csv"
    m = map_url(url)
    assert m.path == url and m.scheme == "https"


def test_local_and_other_schemes_untouched():
    assert map_url("/tmp/x.csv").path == "/tmp/x.csv"
    assert map_url("file:///tmp/x.csv").path == "file:///tmp/x.csv"
    assert map_url("hdfs://nn/x.csv").path == "hdfs://nn/x.csv"


def test_public_read_conf_is_canned_acl():
    assert PUBLIC_READ_CONF == {
        "fs.s3a.acl.default": "PublicRead"
    }


def test_bucket_with_dots_virtual_hosted():
    m = map_url("https://my.dotted.bucket.s3.us-east-1.amazonaws.com/k")
    assert m.path == "s3a://my.dotted.bucket/k"


def test_http_fetch_streams_object(tmp_path):
    """fetch_http_to_local streams a (fake-presigned) HTTP object to a
    local file the CSV reader can scan — the reference's test.py:170
    access model."""
    import http.server
    import threading

    from batch_processing_new_spark.sources.storage import (
        fetch_http_to_local,
    )

    body = b"a,b\n1,x\n2,y\n"

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/in.csv?X-Amz-Signature=abc"
        local = fetch_http_to_local(url)
        with open(local, "rb") as f:
            assert f.read() == body
    finally:
        srv.shutdown()
