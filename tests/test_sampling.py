"""Sampling / mixture / shuffle / packing operators: determinism and
semantic invariants beyond the oracle-parity harness."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.io import load_table
from warp_pipes_spark.pipes.sampling import (
    DeterministicSample,
    EpochShuffle,
    StratifiedSample,
    WeightedMixture,
)
from warp_pipes_spark.text.analysis import TokenCount
from warp_pipes_spark.text.packing import PackSequences


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_deterministic_sample_is_stable_and_nested(spark, sf_dir):
    """Same (key, seed) -> same sample on rerun; and because the gate is a
    threshold on one hash, samples are NESTED: sample(0.2) is a subset of
    sample(0.5) at the same seed — the property that makes keyed sampling
    usable for reproducible scaling-law subsets."""
    docs = _docs(spark, sf_dir)
    half = {r["doc_id"] for r in DeterministicSample(0.5)(docs).select("doc_id").collect()}
    half2 = {r["doc_id"] for r in DeterministicSample(0.5)(docs).select("doc_id").collect()}
    fifth = {r["doc_id"] for r in DeterministicSample(0.2)(docs).select("doc_id").collect()}
    assert half == half2
    assert fifth <= half
    n = docs.count()
    assert abs(len(half) / n - 0.5) < 0.1
    other_seed = {
        r["doc_id"]
        for r in DeterministicSample(0.5, seed=9)(docs).select("doc_id").collect()
    }
    assert other_seed != half  # independent across seeds


def test_stratified_sample_rates(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fractions = {"src0": 1.0, "src1": 0.0}
    out = StratifiedSample(fractions, default=0.5)(docs)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src["src0"] == totals["src0"]  # rate 1.0 keeps everything
    assert "src1" not in by_src  # rate 0.0 drops everything
    rest_kept = sum(n for s, n in by_src.items() if s not in fractions)
    rest_total = sum(n for s, n in totals.items() if s not in fractions)
    assert abs(rest_kept / rest_total - 0.5) < 0.15


def test_weighted_mixture_copy_semantics(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    out = WeightedMixture({"src0": 2.5, "src1": 0.0}, default=1.0)(docs).collect()
    copies = collections.Counter()
    for r in out:
        copies[(r["source"], r["doc_id"])] += 1
    src0_counts = [c for (s, _), c in copies.items() if s == "src0"]
    assert src0_counts and all(c in (2, 3) for c in src0_counts)  # 2 + Bern(0.5)
    assert not any(s == "src1" for s, _ in copies)  # weight 0 drops
    default_counts = [c for (s, _), c in copies.items() if s not in ("src0", "src1")]
    assert default_counts and all(c == 1 for c in default_counts)
    # fractional third copies ~half of src0 docs
    frac = sum(1 for c in src0_counts if c == 3) / len(src0_counts)
    assert 0.2 < frac < 0.8
    # copy_idx distinguishes replicas
    idx = collections.Counter((r["source"], r["doc_id"], r["copy_idx"]) for r in out)
    assert max(idx.values()) == 1


def test_weighted_mixture_rejects_negative(spark):
    with pytest.raises(ValueError):
        WeightedMixture({"a": -1.0})


def test_epoch_shuffle_is_total_permutation(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    out = EpochShuffle(seed=3)(docs).collect()
    assert sorted(r["shuffle_pos"] for r in out) == list(range(1, n + 1))
    again = EpochShuffle(seed=3)(docs).collect()
    assert {(r["doc_id"], r["shuffle_pos"]) for r in out} == {
        (r["doc_id"], r["shuffle_pos"]) for r in again
    }
    other = EpochShuffle(seed=4)(docs).collect()
    assert {(r["doc_id"], r["shuffle_pos"]) for r in out} != {
        (r["doc_id"], r["shuffle_pos"]) for r in other
    }


def test_pack_sequences_invariants(spark, sf_dir):
    docs = TokenCount()(_docs(spark, sf_dir))
    cap = 128
    rows = PackSequences(capacity=cap)(docs).collect()
    by_shard = collections.defaultdict(list)
    for r in rows:
        by_shard[r["source"]].append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        stream = 0
        for r in rs:
            # placement = running token stream cut every `cap`
            assert r["start_pack"] == stream // cap, (shard, r)
            assert r["pack_offset"] == stream % cap, (shard, r)
            end = stream + r["n_tokens"] - 1 if r["n_tokens"] > 0 else stream
            assert r["end_pack"] == end // cap, (shard, r)
            stream += r["n_tokens"]


def test_pack_sequences_rejects_bad_capacity(spark):
    with pytest.raises(ValueError):
        PackSequences(capacity=0)


def test_cross_corpus_overlap_containment(spark):
    """Containment is asymmetric: a benchmark doc fully quoted inside a
    longer train doc scores 1.0; partial overlap scores |∩|/|bench|."""
    from warp_pipes_spark.text.dedup import CrossCorpusOverlap

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )  # trigrams: {alpha beta gamma, beta gamma delta}
    train = spark.createDataFrame(
        [
            (10, "prefix words alpha beta gamma delta suffix words here"),
            (11, "alpha beta gamma unrelated tail of text"),
            (12, "completely different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["train_id"]: r["containment"]
        for r in CrossCorpusOverlap(benchmark=bench, n=3, threshold=0.4)(train).collect()
    }
    assert rows[10] == 1.0       # both bench trigrams present
    assert rows[11] == 0.5       # one of two
    assert 12 not in rows        # zero overlap


def test_repetition_score_known_values(spark):
    from warp_pipes_spark.text.analysis import RepetitionScore

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),       # 4 bigrams, 1 distinct
            (2, "all words here are unique ones"), # no repeated bigram
            (3, "x"),                              # too short: 0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rep_frac"] for r in RepetitionScore(n=2)(df).collect()}
    assert got[1] == 0.75
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_threshold_hex_properties():
    """Pure math of the gate threshold: 12 lowercase hex chars (or the 'g'
    sentinel at 1.0), monotone in the fraction, lexicographic order =
    numeric order — the property the whole md5-gate family rests on."""
    import string
    from hypothesis import given, strategies as st

    from warp_pipes_spark.pipes.sampling import _threshold_hex

    assert _threshold_hex(0.0) == "0" * 12
    assert _threshold_hex(1.0) == "g"  # above every hex gate
    assert _threshold_hex(1.5) == "g"
    assert _threshold_hex(-0.5) == "0" * 12

    @given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
           st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    def monotone(f1, f2):
        t1, t2 = _threshold_hex(f1), _threshold_hex(f2)
        if f1 <= f2:
            assert t1 <= t2
        for t, f in ((t1, f1), (t2, f2)):
            if f < 1.0:
                assert len(t) == 12 and all(c in string.hexdigits.lower() for c in t)

    monotone()


def test_text_features_equals_expression_operators(spark, sf_dir):
    """The fused Arrow kernel must be bit-identical to the three column-
    expression operators it replaces (same tokenization, same tie-breaks,
    same decimal-6 rounding) on every document."""
    from warp_pipes_spark.text.analysis import (
        LangId,
        QualityScore,
        RepetitionScore,
        TextFeatures,
    )

    docs = _docs(spark, sf_dir)
    cols = ["doc_id", "pred_lang", "q_tokens", "q_punct_ratio", "rep_frac"]
    want = sorted(
        tuple(r[c] for c in cols)
        for r in LangId()(QualityScore()(RepetitionScore(n=2)(docs))).select(*cols).collect()
    )
    got = sorted(
        tuple(r[c] for c in cols)
        for r in TextFeatures(rep_n=2)(docs).select(*cols).collect()
    )
    assert got == want


def test_group_cap_binds_and_is_deterministic(spark):
    from warp_pipes_spark.pipes.sampling import GroupCap

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    out1 = GroupCap(cap=5, group_col="source")(df)
    rows1 = sorted((r["doc_id"], r["source"]) for r in out1.collect())
    counts = {}
    for _, g in rows1:
        counts[g] = counts.get(g, 0) + 1
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # repartitioning the input must not change the selection (hash order,
    # not partition order)
    out2 = GroupCap(cap=5, group_col="source")(df.repartition(7))
    assert rows1 == sorted((r["doc_id"], r["source"]) for r in out2.collect())
    # a different seed picks a different subset
    out3 = GroupCap(cap=5, group_col="source", seed=1)(df)
    assert rows1 != sorted((r["doc_id"], r["source"]) for r in out3.collect())


def test_split_assign_partitions_every_row(spark, sf_dir):
    from warp_pipes_spark.pipes.sampling import SplitAssign

    docs_small = _docs(spark, sf_dir)
    out = SplitAssign({"val": 0.2, "test": 0.1}, seed=3)(docs_small)
    rows = out.collect()
    assert len(rows) == docs_small.count()
    names = {r["split"] for r in rows}
    assert names <= {"train", "val", "test"}
    # deterministic across partitionings
    again = SplitAssign({"val": 0.2, "test": 0.1}, seed=3)(docs_small.repartition(7))
    assert sorted((r["doc_id"], r["split"]) for r in out.collect()) == sorted(
        (r["doc_id"], r["split"]) for r in again.collect()
    )


def test_split_assign_stable_under_corpus_growth(spark, sf_dir):
    """A row's split does not change when more rows are added — the
    defining advantage over RNG splits."""
    from warp_pipes_spark.pipes.sampling import SplitAssign

    docs_small = _docs(spark, sf_dir)
    sa = SplitAssign({"val": 0.3}, seed=1)
    half = docs_small.filter(F.col("doc_id") < 10)
    full_map = {r["doc_id"]: r["split"] for r in sa(docs_small).collect()}
    half_map = {r["doc_id"]: r["split"] for r in sa(half).collect()}
    assert all(full_map[k] == v for k, v in half_map.items())


def test_split_assign_rejects_bad_fractions():
    import pytest as _pytest

    from warp_pipes_spark.pipes.sampling import SplitAssign

    with _pytest.raises(ValueError):
        SplitAssign({})
    with _pytest.raises(ValueError):
        SplitAssign({"a": 0.7, "b": 0.4})
    with _pytest.raises(ValueError):
        SplitAssign({"a": -0.1})


def test_temperature_mixture_flattens_composition(spark):
    """T=1 reproduces the corpus exactly (w_s = 1 for every source); T=0.3
    rebalances a 10:1-skewed corpus toward uniform — the minority source's
    share must rise substantially while total stays ~N."""
    from warp_pipes_spark.pipes.sampling import TemperatureMixture

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    ident = TemperatureMixture(temperature=1.0)(df)
    assert ident.count() == 440
    assert ident.select("doc_id").distinct().count() == 440
    assert ident.agg({"mix_weight": "max"}).collect()[0][0] == 1.0

    mixed = TemperatureMixture(temperature=0.3)(df)
    by_src = {r["source"]: r["n"] for r in
              mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_total = sum(by_src.values())
    assert abs(n_total - 440) <= 25              # total stays ~N
    small_share = by_src["small"] / n_total
    assert small_share > 0.25                    # was 40/440 = 9%
    # deterministic: same plan twice, same rows
    a = sorted(map(tuple, mixed.collect()))
    b = sorted(map(tuple, TemperatureMixture(temperature=0.3)(df).collect()))
    assert a == b


def test_chat_template_mask_boundary(spark):
    """Loss mask: exactly 0 over user-marker+prompt+assistant-marker
    tokens, 1 over response+eos tokens; boundary exact by construction."""
    from warp_pipes_spark.text.packing import ChatTemplate

    df = spark.createDataFrame(
        [(0, "what is spark", "a cluster engine"), (1, "hi", "")],
        "doc_id long, prompt string, response string",
    )
    out = {r["doc_id"]: r for r in ChatTemplate()(df).collect()}
    r0 = out[0]
    # masked: user + what is spark + assistant = 5; learned: 3 + eos = 4
    assert r0["n_prompt_tokens"] == 5
    assert r0["n_response_tokens"] == 4
    assert r0["loss_mask"] == [0] * 5 + [1] * 4
    assert len(r0["input_ids"]) == 9
    # empty response still learns the EOS token
    r1 = out[1]
    assert r1["n_response_tokens"] == 1
    assert r1["loss_mask"][-1] == 1


def test_unimax_waterfall_integer_semantics():
    """The published UniMax waterfall: ascending visit order, epoch cap
    binds only low-resource sources, leftover budget flows onward; exact
    integer floor division."""
    from warp_pipes_spark.pipes.sampling import UniMaxSample

    counts = {"tiny": 10, "small": 100, "big": 10_000}
    # budget 5000, cap 2 epochs: tiny capped at 20, small at 200, big
    # absorbs what's left
    alloc = UniMaxSample.waterfall(counts, budget=5000, epoch_cap=2)
    assert alloc["tiny"] == 20      # min(2*10, 5000//3=1666)
    assert alloc["small"] == 200    # min(2*100, 4980//2=2490)
    assert alloc["big"] == 4780     # min(2*10000, 4780//1)
    assert sum(alloc.values()) == 5000
    # uncapped regime: pure uniform thirds
    alloc = UniMaxSample.waterfall(counts, budget=30, epoch_cap=100)
    assert alloc == {"tiny": 10, "small": 10, "big": 10}


def test_unimax_sample_respects_allocation(spark):
    """Doc-level gate: kept fraction per source tracks alloc/c, sources
    with alloc >= c keep everything ('g' sentinel path)."""
    from warp_pipes_spark.pipes.sampling import UniMaxSample

    rows = [(i, "rich", "word " * 50) for i in range(40)]
    rows += [(100 + i, "poor", "tok " + "tok " * 4) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = UniMaxSample(budget_num=1, budget_den=2, epoch_cap=2)(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # poor: c=20 tokens, cap 2*20=40 > share(1010//2=505)? no - share
    # wins only if smaller; alloc=min(40,505)=40 >= c -> keep ALL poor docs
    assert len(by_src.get("poor", [])) == 4
    # rich: alloc = 1010-40=970 of c=2000 -> roughly half the docs survive
    n_rich = len(by_src.get("rich", []))
    assert 8 <= n_rich <= 32, f"rich kept {n_rich}/40, expected ~half"
    assert all(r["source_alloc"] == 970 for r in by_src["rich"])


def test_best_fit_pack_properties(spark):
    """BFD invariants: no pack over capacity (except dedicated overflow
    singletons), no example split, offsets are disjoint within a pack,
    and the pack count is near the lower bound ceil(total/cap)."""
    import math

    from warp_pipes_spark.text.packing import BestFitPack

    rows = [(i, "s", 30 + (i * 37) % 400) for i in range(60)]
    rows.append((100, "s", 700))  # oversized: dedicated overflow pack
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = BestFitPack(capacity=512)(df).collect()
    assert len(out) == 61  # every doc placed exactly once
    fills = {}
    for r in out:
        fills.setdefault(r["pack_id"], []).append((r["pack_offset"], r["n_tokens"]))
    for pid, spans in fills.items():
        spans.sort()
        end = 0
        for off, n in spans:
            assert off == end, f"gap/overlap in pack {pid}"
            end = off + n
        if len(spans) > 1:
            assert end <= 512
    total = sum(n for _, _, n in rows if n <= 512)
    n_regular = len([p for p, s in fills.items() if not (len(s) == 1 and s[0][1] > 512)])
    assert n_regular <= math.ceil(total / 512) + 3  # BFD stays near optimum


def test_best_fit_pack_sub_shards_scales_parallelism(spark):
    """sub_shards=K salts each shard into K deterministic md5 groups:
    packing stays valid per group, pack ids stay unique per shard (range
    offset s << 32), and membership is stable across runs."""
    from warp_pipes_spark.text.packing import BestFitPack

    rows = [(i, "s", 30 + (i * 37) % 400) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out1 = BestFitPack(capacity=512, sub_shards=4)(df).collect()
    out2 = BestFitPack(capacity=512, sub_shards=4)(df).collect()
    key = lambda rs: sorted((r["id"], r["pack_id"], r["pack_offset"]) for r in rs)
    assert key(out1) == key(out2)  # deterministic
    subs = {r["pack_id"] >> 32 for r in out1}
    assert len(subs) > 1  # really split across sub-shards
    fills = {}
    for r in out1:
        fills.setdefault(r["pack_id"], []).append((r["pack_offset"], r["n_tokens"]))
    for pid, spans in fills.items():
        spans.sort()
        end = 0
        for off, n in spans:
            assert off == end
            end = off + n
        assert end <= 512


def test_best_fit_pack_string_ids_and_int_shards(spark):
    """Configurable id/shard columns keep their input types in the output
    (string ids, integer shards) — the schema is derived, not hardcoded."""
    from warp_pipes_spark.text.packing import BestFitPack

    df = spark.createDataFrame(
        [("u1", 7, 100), ("u2", 7, 100), ("u3", 8, 400)],
        "url string, bucket int, n_tokens long",
    )
    out = BestFitPack(capacity=512, id_col="url", shard_col="bucket")(df)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"u1", "u2", "u3"}
    assert dict(out.dtypes)["id"] == "string"
    assert dict(out.dtypes)["shard"] == "int"
    assert rows["u1"]["pack_id"] == rows["u2"]["pack_id"]  # co-packed


def test_packed_batches_collator_invariants(spark, sf_dir):
    """q165's packed arrays must satisfy what a packed-attention collator
    assumes: aligned lengths, position_ids reset to 0 exactly at each
    doc boundary, segment_ids monotone with one segment per packed doc,
    and no multi-doc pack exceeding capacity."""
    from warp_pipes_spark.queries import q165_packed_batches

    rows = q165_packed_batches(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n = r["n_tokens"]
        assert len(r["input_ids"]) == len(r["position_ids"]) == len(r["segment_ids"]) == n
        segs = r["segment_ids"]
        assert segs == sorted(segs)
        assert len(set(segs)) == len(r["doc_ids"])
        # position resets exactly where the segment changes
        for i, p in enumerate(r["position_ids"]):
            if i == 0 or segs[i] != segs[i - 1]:
                assert p == 0, (r["pack_id"], i)
            else:
                assert p == r["position_ids"][i - 1] + 1
        if len(r["doc_ids"]) > 1:
            assert n <= 128


def test_priority_sample_weight_proportionality(spark):
    """A-ES: 5x-weighted rows should dominate the sample; the sample is
    exactly k; determinism across two invocations."""
    from warp_pipes_spark.pipes.sampling import PrioritySample

    df = spark.range(600).selectExpr(
        "id AS doc_id",
        "CASE WHEN id < 300 THEN 'heavy' ELSE 'light' END AS source",
        "CASE WHEN id < 300 THEN 5.0 ELSE 1.0 END AS weight",
    )
    samp = PrioritySample(k=100, seed=3)
    rows = samp(df).collect()
    assert len(rows) == 100
    heavy = sum(1 for r in rows if r["source"] == "heavy")
    assert heavy > 2 * (100 - heavy), heavy
    rows2 = samp(df).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in rows2)


def test_priority_sample_resumable_under_growth(spark):
    """Priorities are row-local, so growing the corpus only ever REPLACES
    the tail of the sample: every new-sample member that existed before
    must have been in the old sample or beaten someone out."""
    from warp_pipes_spark.pipes.sampling import PrioritySample

    old = spark.range(300).selectExpr("id AS doc_id", "1.0 AS weight")
    new = spark.range(600).selectExpr("id AS doc_id", "1.0 AS weight")
    samp = PrioritySample(k=50, seed=3)
    old_ids = {r["doc_id"] for r in samp(old).collect()}
    new_rows = samp(new).collect()
    survivors = {r["doc_id"] for r in new_rows if r["doc_id"] < 300}
    assert survivors <= old_ids


def test_token_budget_sums_exactly(spark, sf_dir):
    """Apportioned budgets sum exactly to B for several (B, T) configs,
    shares are monotone in source size, and epochs = budget / n."""
    from warp_pipes_spark.io import load_table
    from warp_pipes_spark.pipes.sampling import TokenBudgetPlan

    docs = load_table(spark, sf_dir, "documents")
    for B, temp in ((100_000, 0.7), (99_991, 0.3), (17, 1.0)):
        rows = TokenBudgetPlan(budget_tokens=B, temperature=temp)(docs).collect()
        assert sum(r["token_budget"] for r in rows) == B, (B, temp)
    rows = TokenBudgetPlan(budget_tokens=100_000, temperature=0.7)(docs).collect()
    by_n = sorted(rows, key=lambda r: r["n_tokens"])
    shares = [r["share"] for r in by_n]
    assert shares == sorted(shares)


def test_token_budget_negative_leftover(spark):
    """Six equal sources each round HALF_UP to 0.166667, so the floored
    allocations OVERSHOOT B (leftover L = -2); the signed waterfall must
    still land exactly on B."""
    from warp_pipes_spark.pipes.sampling import TokenBudgetPlan

    docs = spark.range(600).selectExpr(
        "CAST(id % 6 AS STRING) AS source",
        "'alpha beta gamma delta epsilon' AS text",
    )
    rows = TokenBudgetPlan(budget_tokens=1_000_000, temperature=1.0)(
        docs
    ).collect()
    assert sum(r["token_budget"] for r in rows) == 1_000_000
