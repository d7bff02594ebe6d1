"""Engine configuration — the analog of the reference's hard-coded constant
pool (``retrieval/Constants.java:3-80``), made explicit and overridable.

Reference parity notes (file:line cites are into /root/reference/src/main/java):

- BM25 params: the north rule pins k1=0.9, b=0.4 (MS MARCO-standard; the
  repo's committed golden runs ``ColBERT-PRF-VirtualAppendix/BM25/*.res`` were
  produced with these), while in-code Lucene defaults are k1=1.2, b=0.75
  (``stochastic_qpp/QPPOnPreRetrievedResults.java:78``).
- LM-Dirichlet mu=1000 (``retrieval/Constants.java:36``).
- LM-JM lambda=0.2 at call site (``qrels/RetrievedResults.java:67``).
- NUM_WANTED=100 (``retrieval/Constants.java:28``).
- RLM: 20 fdbk docs / 20 expansion terms / fbweight .2 / mixing lambda .9
  (``retrieval/Constants.java:37-45``).
- Rocchio alpha/beta/gamma = .5/.35/.15, 3 negatives
  (``retrieval/Constants.java:46-49``).
- Eval threshold rel>=2 binary (``retrieval/Constants.java:57``).
- QPP top-k 50 (``retrieval/Constants.java:56``); seed 314152
  (``utils/IndexUtils.java:21``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    k1: float = 0.9
    b: float = 0.4
    #: score with Lucene's SmallFloat 4-bit quantized doclen norms
    #: (functions/smallfloat.py) instead of exact doclen — required when
    #: validating against true Lucene runs (the reference's committed
    #: ColBERT-PRF-VirtualAppendix/BM25/*.res goldens); off by default
    #: (SURVEY.md §4: exact doclen is the engine's native semantics).
    smallfloat_norms: bool = False


@dataclass(frozen=True)
class LMDirichletConfig:
    mu: float = 1000.0


@dataclass(frozen=True)
class LMJelinekMercerConfig:
    lam: float = 0.2


@dataclass(frozen=True)
class FeedbackConfig:
    num_top_docs: int = 20          # RLM_NUM_TOP_DOCS, Constants.java:41
    num_expansion_terms: int = 20   # Constants.java:37
    fb_weight: float = 0.2          # Constants.java:45
    mixing_lambda: float = 0.9      # MIXING_LAMDA, Constants.java:38
    rocchio_alpha: float = 0.5      # Constants.java:46
    rocchio_beta: float = 0.35      # Constants.java:47
    rocchio_gamma: float = 0.15     # Constants.java:48
    rocchio_num_negatives: int = 3  # Constants.java:49
    srlm_num_top_terms: int = 5     # NUM_TOP_TERMS, Constants.java:31


@dataclass(frozen=True)
class EvalConfig:
    min_rel: int = 2                # EVAL_MIN_REL, Constants.java:57
    auto_sort_top_docs: bool = True  # Constants.java:73


@dataclass(frozen=True)
class QPPConfig:
    top_k: int = 50                 # QPP_NUM_TOPK, Constants.java:56
    seed: int = 314152              # utils/IndexUtils.java:21
    num_samples: int = 10           # UEFSpecificity.java:38 / RSD


@dataclass(frozen=True)
class IndexConfig:
    """Physical layout knobs for the postings build (SURVEY.md §7 stage B)."""

    analyzer: str = "english"          # "english" | "simple" | "whitespace"
    fold_numbers: bool = True          # T2: docs-only _NUM_ folding
    num_term_buckets: int = 32         # repartition-by-term width
    hot_term_df_threshold: int = 250_000  # df above which a term is salted
    hot_term_salts: int = 16           # salt fan-out for hot terms
    posting_block_size: int = 128      # (docid,tf) entries per block-max block


@dataclass(frozen=True)
class EngineConfig:
    num_wanted: int = 100              # Constants.java:28
    bm25: BM25Config = field(default_factory=BM25Config)
    lmdir: LMDirichletConfig = field(default_factory=LMDirichletConfig)
    lmjm: LMJelinekMercerConfig = field(default_factory=LMJelinekMercerConfig)
    feedback: FeedbackConfig = field(default_factory=FeedbackConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    qpp: QPPConfig = field(default_factory=QPPConfig)
    index: IndexConfig = field(default_factory=IndexConfig)


DEFAULT = EngineConfig()

# Default scale-factor directory for local runs (driver contract).
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
