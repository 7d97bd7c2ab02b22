"""Transcript synthesis + extraction invariants from BASELINE.json:
per-turn text equality under stable (conv_id, turn_idx) ordering,
partitioning-independence, and triple-extraction P/R ≥ 0.95."""

import pandas as pd

from pyrdf2vec_spark.extract import (
    extract_triples,
    link_surface,
    precision_recall,
    triples_only,
)
from pyrdf2vec_spark.sources.transcripts import (
    ground_truth_triples,
    reference_transcripts,
    synth_transcripts,
)

N_CONV, N_TURN = 60, 10


class TestSynthesis:
    def test_per_turn_text_equality_vs_reference(self, spark):
        got = (
            synth_transcripts(spark, N_CONV, N_TURN, seed=42)
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        ref = reference_transcripts(N_CONV, N_TURN, seed=42).sort_values(
            ["conv_id", "turn_idx"]
        ).reset_index(drop=True)
        assert len(got) == N_CONV * N_TURN
        pd.testing.assert_series_equal(got["text"], ref["text"])
        pd.testing.assert_series_equal(got["role"], ref["role"])
        pd.testing.assert_series_equal(got["tool"], ref["tool"])

    def test_partitioning_independent(self, spark):
        a = synth_transcripts(spark, 20, 5, partitions=1).orderBy(
            "conv_id", "turn_idx"
        ).toPandas()
        b = synth_transcripts(spark, 20, 5, partitions=7).orderBy(
            "conv_id", "turn_idx"
        ).toPandas()
        pd.testing.assert_frame_equal(a, b)

    def test_schema(self, spark):
        df = synth_transcripts(spark, 5, 3)
        assert [f.name for f in df.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]
        assert df.schema["turn_idx"].dataType.simpleString() == "int"
        assert df.schema["ts"].dataType.simpleString() == "timestamp"

    def test_ts_monotone_within_conv(self, spark):
        pdf = synth_transcripts(spark, 10, 8).toPandas()
        for _, g in pdf.groupby("conv_id"):
            ts = g.sort_values("turn_idx")["ts"]
            assert ts.is_monotonic_increasing


class TestVectorizedPaths:
    def test_gen_batch_matches_rowwise_spec(self):
        import pandas as pd

        from pyrdf2vec_spark.sources.transcripts import (
            _gen_batch,
            _gen_batch_rowwise,
        )

        ids = pd.Series(range(5000))
        a = _gen_batch(ids, 10, 42)
        b = _gen_batch_rowwise(ids, 10, 42)
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True),
            check_dtype=False,
        )

    def test_extract_batch_matches_rowwise_spec(self):
        import pandas as pd

        from pyrdf2vec_spark.extract import (
            PATTERNS,
            _extract_batch,
            link_surface,
        )
        from pyrdf2vec_spark.sources.transcripts import _gen_batch

        df = _gen_batch(pd.Series(range(3000)), 10, 42)
        got = _extract_batch(df)
        rows = []
        for conv_id, turn_idx, text in zip(
            df["conv_id"], df["turn_idx"], df["text"]
        ):
            for pat, pred in PATTERNS:
                for m in pat.finditer(text):
                    s, ss = link_surface(m.group(1))
                    o, os_ = link_surface(m.group(2))
                    rows.append(
                        (conv_id, int(turn_idx), s, pred, o, float(min(ss, os_)))
                    )
        ref = pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "subj", "pred", "obj", "score"],
        )
        cols = list(ref.columns)
        a = got.sort_values(cols).reset_index(drop=True)
        a["turn_idx"] = a["turn_idx"].astype("int64")
        b = ref.sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestLinking:
    def test_surface_variants_link_to_same_id(self):
        for s in ("Person_17", "person 17", "PERSON-17"):
            cid, score = link_surface(s)
            assert cid == "person_17"
            assert score == 1.0


class TestExtraction:
    def test_precision_recall(self, spark):
        tr = synth_transcripts(spark, N_CONV, N_TURN, seed=42)
        extracted = extract_triples(tr)
        truth = spark.createDataFrame(ground_truth_triples(N_CONV, N_TURN, 42))
        p, r = precision_recall(extracted, truth)
        assert p >= 0.95, f"precision {p}"
        assert r >= 0.95, f"recall {r}"

    def test_triples_only_shape(self, spark):
        tr = synth_transcripts(spark, 10, 5)
        t = triples_only(extract_triples(tr))
        assert t.columns == ["subj", "pred", "obj"]
        assert t.count() == t.dropDuplicates().count()

    def test_no_mentions_turn_yields_nothing(self, spark):
        df = spark.createDataFrame(
            [("c1", 0, "user", "nothing noteworthy happened in this turn.", "", None)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        assert extract_triples(df).count() == 0
