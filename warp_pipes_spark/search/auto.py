"""Name → engine registry (config-driven construction).

Capability parity with the reference's ``AutoSearchEngine``
(``warp_pipes/search/auto.py:11-39``) and ``AutoVectorBase``
(``warp_pipes/search/vector_base/auto.py:13-23``): pipelines described as
plain config (name + kwargs) instantiate engines without importing concrete
classes. The reference splits lexical engines and vector bases into two
registries; here every engine is a Pipe over DataFrames, so one registry
covers both (``dense`` maps to the exact engine, ``lsh``/``ivf`` to the
approximate vector paths — the reference's ``index_factory`` dispatch)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from pyspark.sql import DataFrame

from warp_pipes_spark.core.pipe import Pipe
from warp_pipes_spark.ml.quantize import PqCosineTopK
from warp_pipes_spark.ml.similarity import (
    BruteForceCosineTopK,
    IvfCosineTopK,
    LshCosineTopK,
    MatryoshkaTopK,
)
from warp_pipes_spark.search.bm25 import Bm25FSearch, Bm25Search
from warp_pipes_spark.search.group_lookup import GroupLookupSearch
from warp_pipes_spark.search.index import Index
from warp_pipes_spark.search.topk import TopkSearch

# engines that take the corpus DataFrame as their first constructor arg
_CORPUS_ENGINES = {
    "bm25": Bm25Search,
    "bm25f": Bm25FSearch,
    "dense": BruteForceCosineTopK,
    "lsh": LshCosineTopK,
    "ivf": IvfCosineTopK,
    "pq": PqCosineTopK,
    "matryoshka": MatryoshkaTopK,
    "lookup": GroupLookupSearch,
}
# engines constructed from config alone (re-rankers)
_PLAIN_ENGINES = {"topk": TopkSearch}

ENGINES: Dict[str, type] = {**_CORPUS_ENGINES, **_PLAIN_ENGINES}


def auto_engine(
    name: str, corpus: Optional[DataFrame] = None, **config: Any
) -> Pipe:
    """Instantiate a search engine by registry name (reference
    ``AutoSearchEngine``). Corpus-backed engines require ``corpus``."""
    if name not in ENGINES:
        raise KeyError(f"unknown engine {name!r}; known: {sorted(ENGINES)}")
    cls = ENGINES[name]
    if name in _CORPUS_ENGINES:
        if corpus is None:
            raise ValueError(f"engine {name!r} requires a corpus DataFrame")
        return cls(corpus=corpus, **config)
    return cls(**config)


def auto_index(
    corpus: DataFrame,
    engine_configs: Sequence[Dict[str, Any]],
    k: int = 10,
    merge_previous_results: bool = False,
) -> Index:
    """Build an ``Index`` from a config list (the reference's config-driven
    engine chain, ``search/index.py:38-86``)::

        auto_index(docs, [{"name": "bm25", "k": 100},
                          {"name": "topk", "k": 10}], k=10)
    """
    engines = []
    for cfg in engine_configs:
        cfg = dict(cfg)
        name = cfg.pop("name")
        engines.append(auto_engine(name, corpus=corpus, **cfg))
    return Index(
        corpus=corpus,
        engines=engines,
        k=k,
        merge_previous_results=merge_previous_results,
    )
