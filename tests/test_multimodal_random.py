"""Randomized cross-implementation checks for the round-6 "real"
multimodal implementations: the operators run on GENERATED corpora
(not just the driver fixture) and must match independent from-scratch
reference implementations written in this file — a different failure
surface than the DuckDB oracle, which shares the fixture.

Seeded stdlib `random` (not hypothesis): each case builds a parquet
fixture and runs a Spark plan, so we want a fixed small number of
diverse corpora, not per-example shrinking.
"""

from __future__ import annotations

import hashlib
import random
import struct

from pyspark.sql import functions as F  # noqa: F401  (parity with peers)


def _q(spark, sf_dir, name):
    from kbrowse_spark.catalog import all_queries

    return all_queries()[name].builder(spark, sf_dir)


def _gen_texts(rng: random.Random, n: int) -> list[str]:
    """Diverse unicode-bearing texts: ascii words, CJK runs, emoji,
    empty/short edge cases."""
    alphabets = [
        lambda: "".join(
            rng.choice("abcdefgh ijklmnop") for _ in range(rng.randint(0, 80))
        ),
        lambda: "".join(
            chr(rng.randint(0x4E00, 0x4E80)) for _ in range(rng.randint(1, 40))
        ),
        lambda: " ".join(
            "word" + str(rng.randint(0, 9)) for _ in range(rng.randint(1, 30))
        ),
        lambda: "\U0001f600" * rng.randint(1, 5) + " mixed 中文 text",
        lambda: "",
        lambda: "ab",
    ]
    return [rng.choice(alphabets)() for _ in range(n)]


def _write_documents(spark, tmp_path, texts) -> str:
    rows = [
        (i, t, "xx", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _ref_embed(text: str):
    """Independent reference: plain Python loops (the operator uses
    vectorized numpy; the oracle uses SQL — this is a third route)."""
    dim, (p0, p1, p2), m = 16, (1009, 9176, 9973), 1_000_003
    cps = [ord(c) for c in text]
    vec = [0] * dim
    n = 0
    for i in range(len(cps) - 2):
        h = (cps[i] * p0 + cps[i + 1] * p1 + cps[i + 2] * p2) % m
        vec[h % dim] += 1 if (h // dim) % 2 == 0 else -1
        n += 1
    return n, vec


def test_embed_batch_inference_matches_reference_on_random_corpora(
    spark, tmp_path
):
    rng = random.Random(20260814)
    for case in range(3):
        texts = _gen_texts(rng, 25)
        sf = _write_documents(spark, tmp_path / f"c{case}", texts)
        rows = {r.doc_id: r for r in _q(spark, sf, "embed_batch_inference").collect()}
        assert len(rows) == len(texts)
        for i, t in enumerate(texts):
            n, vec = _ref_embed(t)
            r = rows[i]
            assert r.n_trigrams == n, (i, t)
            got = [r[f"b{j}"] for j in range(16)]
            assert got == vec, (i, t)
            assert r.norm_sq == sum(v * v for v in vec)


def _ref_parse_wav(payload: bytes) -> dict:
    """Independent sequential RIFF reader (the operator walks a chunk
    dict; this one streams through the file front to back)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    (riff_size,) = struct.unpack("<I", payload[4:8])
    assert riff_size == len(payload) - 8
    off, fmt, meta, data = 12, None, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"meta":
            meta = body.decode()
        elif cid == b"data":
            data = body
        off += 8 + size + size % 2
    code, n_ch, rate, _, _, bits = fmt
    return {
        "n_bytes": len(payload),
        "fmt_code": code,
        "n_channels": n_ch,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": len(data) // (bits // 8),
        "data_md5": hashlib.md5(data).hexdigest(),
        "meta_tag": meta,
    }


def test_multimodal_feature_extract_matches_reference_on_random_corpora(
    spark, tmp_path
):
    """Rebuild each generated doc's expected WAV container in the test
    (same public spec, independent code), parse it with the sequential
    reference reader, and demand the operator's decode agree field for
    field — including the md5 round trip."""

    def ref_pack(doc_id: int, data: bytes) -> bytes:
        def chunk(cid, body):
            pad = b"\x00" if len(body) % 2 else b""
            return cid + struct.pack("<I", len(body)) + body + pad

        body = (
            b"WAVE"
            + chunk(b"fmt ", struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
            + chunk(b"meta", str(doc_id).encode())
            + chunk(b"data", data)
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = random.Random(99)
    texts = _gen_texts(rng, 30)
    sf = _write_documents(spark, tmp_path, texts)
    rows = {
        r.doc_id: r for r in _q(spark, sf, "multimodal_feature_extract").collect()
    }
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        expected = _ref_parse_wav(ref_pack(i, t.encode("utf-8")))
        r = rows[i]
        for k, v in expected.items():
            assert r[k] == v, (i, k, r[k], v)
        assert r.duration_ms == expected["n_samples"] * 1000 // 8000


def test_multimodal_video_extract_matches_reference_on_random_corpora(
    spark, tmp_path
):
    """Independent sequential reference for the AVI path: recompute the
    expected container size from the spec chunk arithmetic, the frame
    count, and the sampled-frame md5 by slicing the zero-padded payload
    directly (the operator seeks through idx1; this walks linearly —
    a different route to the same bytes)."""
    FRAME, STEP = 256, 5
    FIXED, PER_FRAME = 1256, 280

    def ref(doc_text: str) -> dict:
        data = doc_text.encode("utf-8")
        n = max((len(data) + FRAME - 1) // FRAME, 1)
        padded = data + b"\x00" * (n * FRAME - len(data))
        md = hashlib.md5()
        sampled = 0
        for i in range(0, n, STEP):
            md.update(padded[i * FRAME : (i + 1) * FRAME])
            sampled += 1
        return {
            "n_bytes": FIXED + n * PER_FRAME,
            "n_frames": n,
            "width": 16,
            "height": 16,
            "bpp": 8,
            "fps": 25,
            "frames_sampled": sampled,
            "sampled_md5": md.hexdigest(),
        }

    rng = random.Random(1234)
    texts = _gen_texts(rng, 30)
    sf = _write_documents(spark, tmp_path, texts)
    rows = {
        r.doc_id: r for r in _q(spark, sf, "multimodal_video_extract").collect()
    }
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        expected = ref(t)
        r = rows[i]
        for k, v in expected.items():
            assert r[k] == v, (i, k, r[k], v)


def _ref_parse_warc(buf: bytes) -> dict:
    """Independent WARC reader: regex-free, splits the header block
    with bytes.split (the operator walks with index); advances by
    Content-Length like any conformant reader must."""
    recs = []
    pos = 0
    while pos < len(buf):
        head_end = buf.index(b"\r\n\r\n", pos)
        head = buf[pos:head_end].decode("utf-8").split("\r\n")
        assert head[0] == "WARC/1.1"
        fields = dict(line.split(": ", 1) for line in head[1:])
        clen = int(fields["Content-Length"])
        body_start = head_end + 4
        body = buf[body_start : body_start + clen]
        assert len(body) == clen
        assert buf[body_start + clen : body_start + clen + 4] == b"\r\n\r\n"
        recs.append((fields, body))
        pos = body_start + clen + 4
    return recs


def test_warc_record_extract_matches_reference_on_random_corpora(
    spark, tmp_path
):
    """Random corpora INCLUDING payloads that embed fake record
    boundaries (\\r\\n\\r\\nWARC/1.1\\r\\n) — a delimiter-scanning
    parser would split there; the Content-Length walk must not."""
    rng = random.Random(20260815)
    for case in range(3):
        texts = _gen_texts(rng, 20)
        # adversarial payloads: embedded terminator + version line,
        # embedded header-looking lines, bare CR / LF runs
        texts += [
            "before\r\n\r\nWARC/1.1\r\nWARC-Type: response\r\n\r\nafter",
            "Content-Length: 999\r\nWARC-Date: fake",
            "\r\n\r\n\r\n",
        ]
        sf = _write_documents(spark, tmp_path / f"w{case}", texts)
        rows = {
            r.doc_id: r for r in _q(spark, sf, "warc_record_extract").collect()
        }
        assert len(rows) == len(texts)
        from kbrowse_spark.operators.multimodal import (
            _warc_response_record,
            _warcinfo_record,
        )

        for i, t in enumerate(texts):
            payload = t.encode("utf-8")
            buf = _warcinfo_record() + _warc_response_record(i, payload)
            recs = _ref_parse_warc(buf)
            assert [f["WARC-Type"] for f, _ in recs] == [
                "warcinfo",
                "response",
            ], (i, t)
            fields, body = recs[1]
            assert body == payload, (i, t)
            r = rows[i]
            assert r.n_records == 2
            assert r.file_bytes == len(buf)
            assert r.target_uri == fields["WARC-Target-URI"]
            assert r.content_length == len(payload)
            assert r.payload_md5 == hashlib.md5(payload).hexdigest()


def test_multimodal_png_extract_matches_reference_on_random_corpora(
    spark, tmp_path
):
    """PNG codec vs an independent reference computation on random
    unicode corpora.  The adversarial arm packs texts whose BYTES
    contain PNG signatures, chunk headers, and "IEND" markers — a
    parser that scanned for byte patterns instead of walking declared
    chunk lengths would mis-frame them (the WARC-test trick)."""
    import zlib

    from kbrowse_spark.operators.multimodal import _IMG_W

    rng = random.Random(0xB06)
    texts = _gen_texts(rng, 36) + [
        # adversarial: container grammar embedded in the payload
        "\x89PNG\r\n\x1a\n fake signature in body",
        "IEND embedded " + "IEND" * 20,
        "IHDR" + "\x00" * 13 + "IDAT stream-looking bytes",
        "x" * (_IMG_W * 3 + 7),  # multi-row with padding remainder
    ]
    sf = _write_documents(spark, tmp_path, texts)
    rows = {
        r.doc_id: r for r in _q(spark, sf, "multimodal_png_extract").collect()
    }
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        data = t.encode("utf-8")
        n_rows = max((len(data) + _IMG_W - 1) // _IMG_W, 1)
        padded = data + b"\x00" * (n_rows * _IMG_W - len(data))
        scan = b"".join(
            b"\x00" + padded[r * _IMG_W : (r + 1) * _IMG_W]
            for r in range(n_rows)
        )
        idat = len(zlib.compress(scan, 6))
        r = rows[i]
        assert (r.width, r.height, r.bit_depth, r.color_type) == (
            _IMG_W,
            n_rows,
            8,
            0,
        )
        assert r.n_chunks == 3
        assert r.idat_bytes == idat
        assert r.n_bytes == 8 + 25 + 12 + idat + 12
        assert r.pixel_md5 == hashlib.md5(padded).hexdigest()
