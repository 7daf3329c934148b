"""Property-based tests (hypothesis) for the stdlib xlsx codec:
arbitrary cell values must survive write -> parse exactly. Pure Python
(no SparkSession), so hundreds of examples are cheap."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from batch_processing_new_spark.sources.excel import _parse_sheet, workbook_bytes

# XML 1.0 forbids most control chars; real spreadsheet text doesn't use
# them either, so generate printable text (incl. unicode, quotes, XML
# metachars, whitespace runs)
cell_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), min_codepoint=0x20
    ),
    max_size=40,
)
cell_value = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    cell_text,
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(cell_value, min_size=1, max_size=6).flatmap(
        lambda proto: st.lists(
            st.tuples(*[cell_value for _ in proto]), min_size=0, max_size=8
        ).map(lambda rows: (len(proto), rows))
    )
)
def test_roundtrip_arbitrary_rows(width_rows):
    width, rows = width_rows
    header = [f"col_{i}" for i in range(width)]
    h2, body = _parse_sheet(workbook_bytes(header, rows))
    assert h2 == header
    assert len(body) == len(rows)
    for orig, got in zip(rows, body):
        for o, g in zip(orig, got):
            if o is None:
                assert g is None
            elif isinstance(o, bool):
                assert g is o
            elif isinstance(o, (int, float)):
                # numbers come back in lexical form; repr round-trips
                assert math.isclose(float(g), float(o), rel_tol=0, abs_tol=0)
            else:
                assert g == o


@settings(max_examples=100, deadline=None)
@given(cell_text)
def test_text_cells_exact(s):
    header = ["t"]
    _, body = _parse_sheet(workbook_bytes(header, [(s,)]))
    # even the empty string survives: it's an inlineStr with an empty
    # <t/>, distinct from a missing cell (<c/> -> None)
    assert body[0][0] == s
