"""Registry-wide property sweep (mirrors reference tests/pipes/test_all_pipes.py:
every operator instantiates, reflects to a JSON struct, and has a
deterministic fingerprint)."""

import pytest
from pyspark.sql import functions as F

from warp_pipes_spark.core.condition import In
from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.pipes.basics import (
    AddPrefix,
    Apply,
    ApplyToAll,
    CopyBatch,
    DropKeys,
    FilterKeys,
    GetKey,
    Identity,
    Lambda,
    Partial,
    RenameKeys,
    ReplaceInKeys,
)
from warp_pipes_spark.pipes.collate import FirstEg, Padding
from warp_pipes_spark.pipes.nesting import (
    ApplyAsFlatten,
    Expand,
    Flatten,
    Nest,
    Nested,
    NestedLevel1,
)
from warp_pipes_spark.pipes.passages import GeneratePassages
from warp_pipes_spark.pipes.pipelines import (
    BlockSequential,
    Gate,
    Parallel,
    ParallelbyField,
    Sequential,
)
from warp_pipes_spark.ml.multimodal import DecodeMedia, ResizeMedia, SampleFrames
from warp_pipes_spark.ml.sketches import PortableHll
from warp_pipes_spark.pipes.tokenizer import RegexTokenizer, WordPieceTokenizer
from warp_pipes_spark.text.web import FixEncoding, HtmlStrip, UrlParse
from warp_pipes_spark.search.topk import TopkSearch
from warp_pipes_spark.text.packing import SpanCorruption
from warp_pipes_spark.ml.drift import KsDrift
from warp_pipes_spark.ml.graph import LabelPropagation
from warp_pipes_spark.ml.kmeans import LloydKMeans
from warp_pipes_spark.ml.pca import PowerIterationPCA
from warp_pipes_spark.plans.skew import KeySkewProfile
from warp_pipes_spark.pipes.validate import BenfordAudit, RobustStats
from warp_pipes_spark.pipes.sampling import MixtureConcentration, NeymanAllocation
from warp_pipes_spark.ml.metrics import (
    BootstrapCI,
    ConfusionPanel,
    RboAgreement,
    SpearmanPanel,
    WilsonRates,
)
from warp_pipes_spark.text.analysis import (
    ContingencyPanel,
    CurriculumReport,
    DiversityReport,
    DocFingerprint,
    VocabularyProfile,
    KneserNeyScore,
    TermBurstiness,
    GopherQualityFilter,
    LangId,
    QualityScore,
    TokenCount,
)
from warp_pipes_spark.search.fuzzy import (
    EditDistanceJoin,
    EditDistanceLookup,
    EntityResolution,
)
from warp_pipes_spark.search.phrase import PhraseSearch
from warp_pipes_spark.search.trigram import (
    TrigramSimilaritySearch,
    TrigramSubstringSearch,
    WildcardLikeSearch,
)
from warp_pipes_spark.text.textrank import TextRankKeywords
from warp_pipes_spark.pipes.validate import RollingRobust
from warp_pipes_spark.search.boolean import BooleanSearch
from warp_pipes_spark.pipes.sampling import LeakageSafeSplit
from warp_pipes_spark.text.dedup import (
    ChunkDedupStats,
    ContainmentPairs,
    ExactDedup,
    MinHashDedup,
    MinHashEstimate,
    NgramJaccardDedup,
    SimHashDedup,
)


def instantiate_all():
    """One representative instance per operator (the reference requires an
    ``instantiate_test`` classmethod on every pipe; we centralize it)."""
    return [
        Identity(),
        Lambda(lambda df: df),
        GetKey("a"),
        FilterKeys(In(["a"])),
        DropKeys(["a"]),
        AddPrefix("p."),
        ReplaceInKeys("p.", ""),
        RenameKeys({"a": "b"}),
        Apply({"a": F.col("a") + 1}),
        ApplyToAll(lambda c: c),
        CopyBatch(),
        Partial(Identity()),
        Sequential(Identity(), Identity()),
        Parallel(Identity()),
        Gate(True, Identity()),
        BlockSequential([("b1", Identity())]),
        ParallelbyField({"doc": Identity()}),
        Flatten("a"),
        Nest("a", group_cols=["row_id"], order_col="pos"),
        ApplyAsFlatten("a", lambda c: c),
        NestedLevel1("a", lambda c: c),
        Nested("a", lambda c: c),
        Expand("a", 2),
        FirstEg(),
        Padding(["ids"], 8),
        RegexTokenizer(),
        GeneratePassages(token_col="ids", size=10, stride=7),
        TokenCount(),
        QualityScore(),
        GopherQualityFilter(),
        LangId(),
        DocFingerprint(),
        ExactDedup(),
        NgramJaccardDedup(),
        MinHashDedup(),
        MinHashEstimate(),
        SimHashDedup(),
        TopkSearch(k=5),
        SpanCorruption(),
        WordPieceTokenizer(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a"]),
        FixEncoding(),
        HtmlStrip(),
        UrlParse(),
        DecodeMedia(),
        SampleFrames(),
        ResizeMedia(),
        PortableHll("v"),
        ContainmentPairs(),
        ChunkDedupStats(),
        TermBurstiness(),
        KneserNeyScore(),
        BootstrapCI("n_tokens"),
        LloydKMeans(),
        KsDrift("n_chars"),
        LabelPropagation(),
        ContingencyPanel(),
        KeySkewProfile("user_id"),
        ConfusionPanel("lang", "pred_lang"),
        NeymanAllocation("n_chars"),
        PowerIterationPCA(),
        CurriculumReport(),
        WilsonRates("keep"),
        BenfordAudit("value"),
        DiversityReport(),
        VocabularyProfile(),
        SpearmanPanel(["a", "b"]),
        MixtureConcentration(),
        RboAgreement(other=None),
        RobustStats("n_chars"),
        TrigramSubstringSearch(corpus=None),
        TrigramSimilaritySearch(corpus=None),
        EditDistanceJoin(d=1),
        PhraseSearch(corpus=None),
        WildcardLikeSearch(corpus=None),
        EntityResolution(d=1),
        TextRankKeywords(),
        RollingRobust("value"),
        EditDistanceLookup(vocab=None),
        BooleanSearch(corpus=None),
        LeakageSafeSplit(pairs=None, splits={"validation": 0.1}),
    ]


def test_fingerprint_deterministic(spark):
    # F.col(...) needs an active session in classic mode -> instantiate lazily
    for pipe in instantiate_all():
        assert isinstance(pipe, Pipe)
        struct = pipe.to_json_struct()
        assert struct.get("__pipe__") or "__pipe__" in str(struct)
        fp1 = pipe.fingerprint
        fp2 = pipe.fingerprint
        assert fp1 == fp2, type(pipe).__name__
        assert len(fp1) == 16


def test_fingerprint_stable_across_instantiations(spark):
    fps1 = [p.fingerprint for p in instantiate_all()]
    fps2 = [p.fingerprint for p in instantiate_all()]
    assert fps1 == fps2


def test_fingerprints_distinguish_configs(spark):
    pipes = instantiate_all()
    fps = {p.fingerprint for p in pipes}
    assert len(fps) == len(pipes), "fingerprint collision across operators"
    assert TopkSearch(k=5).fingerprint != TopkSearch(k=10).fingerprint
    assert AddPrefix("x.").fingerprint != AddPrefix("y.").fingerprint


def test_incremental_dedup_drops_recrawls_keeps_edits(spark):
    from warp_pipes_spark.text.dedup import IncrementalDedup

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma"),        # verbatim re-crawl -> drop
            (11, "alpha beta gamma edited"),  # edited -> keep
            (12, "brand new document"),       # new -> keep
            (13, "brand new document"),       # within-batch dupe -> keep-min only
        ],
        "doc_id long, text string",
    )
    out = sorted(r["doc_id"] for r in IncrementalDedup(corpus=corpus)(batch).collect())
    assert out == [11, 12]


def test_dup_ngram_fraction_shared_span(spark):
    """Two docs share a verbatim 7-token span: with n=5, the span covers 3
    gram positions in each; a third doc with no sharing scores 0; a doc
    shorter than n scores 0 with n_grams=0; WITHIN-doc-only repetition does
    not count (df = distinct docs)."""
    from warp_pipes_spark.text.dedup import DupNgramFraction

    span = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [
            (1, span + " one two three"),           # 10 tokens -> 6 grams
            (2, "x y " + span),                     # 9 tokens  -> 5 grams
            (3, "totally unrelated words appear here today"),
            (4, "tiny doc"),                        # < n tokens
            (5, "rep rep rep rep rep rep rep rep rep rep"),  # self-rep only
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in DupNgramFraction(n=5)(docs).collect()}
    assert out[1]["n_grams"] == 6 and out[1]["n_dup"] == 3
    assert abs(out[1]["dup_frac"] - 0.5) < 1e-12
    assert out[2]["n_grams"] == 5 and out[2]["n_dup"] == 3
    assert out[3]["n_dup"] == 0 and out[3]["dup_frac"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[5]["n_dup"] == 0  # df counts distinct docs, not occurrences


def test_dup_ngram_fraction_rejects_bad_params():
    from warp_pipes_spark.text.dedup import DupNgramFraction

    import pytest as _pytest

    with _pytest.raises(ValueError):
        DupNgramFraction(n=0)
    with _pytest.raises(ValueError):
        DupNgramFraction(min_df=1)
