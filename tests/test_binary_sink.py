"""Binary sink format parity: decode our bytes with Java
DataInputStream semantics and compare; golden bytes for a known entry."""

import io
import struct

from spider_spark.operators.binary_sink import (
    SERIAL_VERSION_UID,
    binary_stream,
    encode_entry,
    metadata_header,
)


def _read_java_utf(buf: io.BytesIO) -> str:
    n = struct.unpack(">H", buf.read(2))[0]
    data = buf.read(n)
    # decode modified UTF-8 (cesu-8-ish); our tests use BMP strings
    out = []
    i = 0
    while i < len(data):
        b = data[i]
        if b < 0x80:
            out.append(chr(b))
            i += 1
        elif b >> 5 == 0b110:
            out.append(chr(((b & 0x1F) << 6) | (data[i + 1] & 0x3F)))
            i += 2
        else:
            cp = ((b & 0x0F) << 12) | ((data[i + 1] & 0x3F) << 6) | (data[i + 2] & 0x3F)
            out.append(chr(cp))
            i += 3
    return "".join(out)


def test_entry_roundtrip():
    blob = encode_entry("hello", "http://h.example/d/1", 0.125,
                        "A Title", [3, 7, 99])
    buf = io.BytesIO(blob)
    uid = struct.unpack(">q", buf.read(8))[0]
    assert uid & 0xFFFFFFFFFFFFFFFF == SERIAL_VERSION_UID
    assert struct.unpack(">i", buf.read(4))[0] == 2  # PAGE ordinal
    assert _read_java_utf(buf) == "hello"
    assert struct.unpack(">f", buf.read(4))[0] == 0.125
    assert _read_java_utf(buf) == "http://h.example/d/1"
    size_field = struct.unpack(">i", buf.read(4))[0]
    assert size_field == ~3  # title set → inverted size (TermEntryWriter.java:47)
    assert _read_java_utf(buf) == "A Title"
    for expected in (3, 7, 99):
        assert struct.unpack(">i", buf.read(4))[0] == expected
        assert _read_java_utf(buf) == ""
    assert buf.read() == b""


def test_entry_no_title():
    blob = encode_entry("x", "u", 1.0, None, [1])
    buf = io.BytesIO(blob)
    buf.read(8 + 4)
    _read_java_utf(buf)
    buf.read(4)
    _read_java_utf(buf)
    assert struct.unpack(">i", buf.read(4))[0] == 1  # plain size, no invert


def test_int32_min_position_survives():
    blob = encode_entry("t", "u", 0.5, "T", [-(2**31), -(2**31) + 1])
    buf = io.BytesIO(blob)
    buf.read(8 + 4)
    _read_java_utf(buf)
    buf.read(4)
    _read_java_utf(buf)
    assert struct.unpack(">i", buf.read(4))[0] == ~2
    _read_java_utf(buf)
    assert struct.unpack(">i", buf.read(4))[0] == -(2**31)


def test_cjk_and_supplementary_utf():
    # surrogate-pair encoding for Ext-B char (modified UTF-8 = CESU-8)
    blob = encode_entry("樹\U000233B4", "u", 0.5, None, [])
    buf = io.BytesIO(blob)
    buf.read(8 + 4)
    n = struct.unpack(">H", buf.read(2))[0]
    assert n == 3 + 6  # 樹 (3 bytes) + surrogate pair (2×3 bytes)


def test_header_and_stream():
    header = metadata_header("Spider index", "Freenet", "(nil)", 42)
    assert b"index.title=Spider index" in header
    assert header.endswith(b"End\n")
    rows = [
        {"term": "aa", "doc_id": "u1", "rel": 0.5, "title": None, "positions": [1]},
        {"term": "ab", "doc_id": "u2", "rel": 0.25, "title": "T", "positions": [2, 3]},
    ]
    stream = binary_stream(rows, header)
    assert stream.startswith(header)
    assert len(stream) > len(header)


def test_distributed_binary_write(spark, tmp_path):
    from spider_spark.operators.binary_sink import write_binary_postings

    rows = [
        ("zeta", "u3", 0.1, None, [5]),
        ("alpha", "u1", 0.9, "T", [1, 2]),
        ("alpha", "u2", 0.9, None, [7]),
    ]
    df = spark.createDataFrame(
        rows, "term string, doc_id string, rel float, title string, positions array<int>"
    )
    out = str(tmp_path / "bin")
    write_binary_postings(df, out, partitions=2)
    blobs = [r["entry"] for r in spark.read.parquet(out).collect()]
    assert len(blobs) == 3
    decoded_terms = []
    for b in blobs:
        buf = io.BytesIO(b)
        buf.read(12)
        decoded_terms.append(_read_java_utf(buf))
    assert sorted(decoded_terms) == ["alpha", "alpha", "zeta"]


def test_pos_fragments_written_when_present():
    """posFragments fidelity (TermPageEntry.java:33): the sink reads the
    map instead of hardcoding empty fragments."""
    import struct

    empty = encode_entry("t", "u", 0.5, None, [7])
    frag = encode_entry("t", "u", 0.5, None, [7], {7: "snippet"})
    assert empty != frag
    assert frag.endswith(struct.pack(">H", 7) + b"snippet")
    # absent / empty map behaves exactly as before
    assert encode_entry("t", "u", 0.5, None, [7], {}) == empty
    assert encode_entry("t", "u", 0.5, None, [7], {3: "other"}) == empty
