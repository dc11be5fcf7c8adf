"""Minimal Avro OCF codec (sources/avro_ocf.py): hand-computed spec byte
vectors, container round-trips (null + deflate codecs), nested schema
coverage, and a hypothesis property round-trip."""

import io
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from copy_sharepoint_to_onelake_lakehousefiles_spark.sources.avro_ocf import (
    _Names,
    decode,
    encode,
    read_long,
    read_ocf,
    write_long,
    write_ocf,
)


def _enc_long(n: int) -> bytes:
    b = io.BytesIO()
    write_long(b, n)
    return b.getvalue()


def test_zigzag_varint_spec_vectors():
    # the Avro spec's own table
    assert _enc_long(0) == b"\x00"
    assert _enc_long(-1) == b"\x01"
    assert _enc_long(1) == b"\x02"
    assert _enc_long(-2) == b"\x03"
    assert _enc_long(2) == b"\x04"
    assert _enc_long(64) == b"\x80\x01"
    assert _enc_long(-65) == b"\x81\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**62)):
        assert read_long(io.BytesIO(_enc_long(n))) == n


def test_primitive_encodings_match_spec():
    names = _Names()
    b = io.BytesIO()
    encode(b, "string", "foo", names)
    assert b.getvalue() == b"\x06foo"
    b = io.BytesIO()
    encode(b, "boolean", True, names)
    assert b.getvalue() == b"\x01"
    b = io.BytesIO()
    encode(b, "double", 1.0, names)
    assert b.getvalue() == b"\x00\x00\x00\x00\x00\x00\xf0?"
    # union [null, long]: null → index 0 only; 5 → index 1 then value
    b = io.BytesIO()
    encode(b, ["null", "long"], None, names)
    assert b.getvalue() == b"\x00"
    b = io.BytesIO()
    encode(b, ["null", "long"], 5, names)
    assert b.getvalue() == b"\x02\x0a"


NESTED = {
    "type": "record",
    "name": "top",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "tag", "type": ["null", "string"], "default": None},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
        {"name": "kv", "type": {"type": "map", "values": "double"}},
        {
            "name": "inner",
            "type": {
                "type": "record",
                "name": "inner_r",
                "fields": [
                    {"name": "b", "type": "bytes"},
                    {"name": "e", "type": {"type": "enum", "name": "col", "symbols": ["R", "G"]}},
                    {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
                ],
            },
        },
    ],
}

ROWS = [
    {"id": 1, "tag": "a", "xs": [1, -2, 3], "kv": {"x": 0.5},
     "inner": {"b": b"\x01\x02", "e": "G", "fx": b"abcd"}},
    {"id": -9, "tag": None, "xs": [], "kv": {},
     "inner": {"b": b"", "e": "R", "fx": b"zzzz"}},
]


def test_ocf_roundtrip_null_and_deflate(tmp_path):
    for codec in ("null", "deflate"):
        p = os.path.join(str(tmp_path), f"t_{codec}.avro")
        write_ocf(p, NESTED, ROWS, codec=codec)
        meta, back = read_ocf(p)
        assert back == ROWS
        assert meta["avro.schema"]["name"] == "top"
        assert meta["avro.codec"].decode() if isinstance(meta["avro.codec"], bytes) else meta["avro.codec"]


def test_ocf_named_type_reference(tmp_path):
    # a named record referenced by name in a second field (Iceberg's r2 refs)
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "record",
                    "name": "pt",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
            {"name": "b", "type": "pt"},
        ],
    }
    rows = [{"a": {"x": 1}, "b": {"x": 2}}]
    p = os.path.join(str(tmp_path), "named.avro")
    write_ocf(p, schema, rows)
    _, back = read_ocf(p)
    assert back == rows


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "tag": st.one_of(st.none(), st.text(max_size=20)),
                "xs": st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=5),
                "kv": st.dictionaries(st.text(max_size=8), st.floats(allow_nan=False), max_size=4),
                "inner": st.fixed_dictionaries(
                    {
                        "b": st.binary(max_size=16),
                        "e": st.sampled_from(["R", "G"]),
                        "fx": st.binary(min_size=4, max_size=4),
                    }
                ),
            }
        ),
        max_size=8,
    )
)
def test_property_roundtrip(rows):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "prop.avro")
        write_ocf(p, NESTED, rows, codec="deflate")
        _, back = read_ocf(p)
        assert back == rows
