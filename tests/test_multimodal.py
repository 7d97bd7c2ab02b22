"""Multimodal column path: REAL WAV/PPM codecs (byte-level parse,
stdlib-verifiable containers) + the Arrow feature-extraction plumbing.
The synthesized containers' parameters are closed-form in doc_id, so
every decoded feature is checked against exact expectations (the same
arithmetic the multimodal_decoded DuckDB oracle runs)."""

import io
import wave

import pytest

from pyrdf2vec_spark.functions.multimodal import (
    _ppm_bytes,
    _wav_bytes,
    decode_ppm,
    decode_real,
    decode_wav,
    extract_features,
    frame_sample_plan,
    synth_media,
    synth_real_media,
)


def _expected(doc_id: int) -> list:
    if doc_id % 2 == 1:
        a = 1000 + (doc_id % 100) * 10
        p = 8 + (doc_id % 8) * 2
        n = 128 + (doc_id % 5) * 16
        return [1, 8000, n, a, (n - 1) // (p // 2)]
    return [
        4 + doc_id % 5,
        3 + doc_id % 4,
        doc_id % 256,
        (doc_id * 7) % 256,
        (doc_id * 13) % 256,
    ]


class TestCodecs:
    @pytest.mark.parametrize("doc_id", [1, 3, 99, 101, 511, 999])
    def test_wav_roundtrip_exact(self, doc_id):
        payload = _wav_bytes(doc_id)
        # the container must be a REAL WAV: stdlib wave accepts it
        wf = wave.open(io.BytesIO(payload))
        assert (wf.getnchannels(), wf.getframerate(), wf.getsampwidth()) == (
            1, 8000, 2,
        )
        assert list(decode_real(payload, "audio/wav")) == _expected(doc_id)

    @pytest.mark.parametrize("doc_id", [0, 2, 100, 254, 512])
    def test_ppm_roundtrip_exact(self, doc_id):
        payload = _ppm_bytes(doc_id)
        px = decode_ppm(payload)
        assert px.shape == (3 + doc_id % 4, 4 + doc_id % 5, 3)
        assert list(decode_real(payload, "image/x-portable-pixmap")) == _expected(
            doc_id
        )

    def test_ppm_comment_and_whitespace_tolerant(self):
        raw = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
        px = decode_ppm(raw)
        assert px.shape == (1, 2, 3)
        assert px[0, 1].tolist() == [4, 5, 6]

    def test_wav_rejects_non_riff(self):
        with pytest.raises(ValueError):
            decode_wav(b"nope" * 20)

    def test_unknown_mime_raises(self):
        with pytest.raises(NotImplementedError):
            decode_real(b"\x00\x01", "video/mp4")


class TestSparkPlumbing:
    def test_real_features_end_to_end(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
        )
        media = synth_real_media(docs)
        feats = {
            r["media_id"]: [int(x) for x in r["feature"]]
            for r in extract_features(
                media, dim=5, use_real_decoder=True
            ).collect()
        }
        assert len(feats) == 20
        for doc_id, got in feats.items():
            assert got == _expected(doc_id), doc_id

    def test_fake_features_shape_and_partitioning(self, spark):
        docs = spark.createDataFrame(
            [(i, f"doc body {i}") for i in range(12)],
            "doc_id long, text string",
        ).repartition(3)
        media = synth_media(docs)
        out = extract_features(media, dim=8)
        # mapInPandas must not shuffle: partition count is preserved
        assert out.rdd.getNumPartitions() == media.rdd.getNumPartitions()
        rows = out.collect()
        assert len(rows) == 12
        assert all(len(r["feature"]) == 8 for r in rows)

    def test_frame_sample_plan(self, spark):
        docs = spark.createDataFrame(
            [(i, f"v {i}") for i in range(9)], "doc_id long, text string"
        )
        media = synth_media(docs)  # doc_id % 3 == 2 → video
        plan = frame_sample_plan(media, every_n=2)
        got = {
            (r["media_id"], r["frame_idx"]) for r in plan.collect()
        }
        assert got  # some videos exist
        assert all(idx % 2 == 0 for _, idx in got)
