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


# ---------------------------------------------------------------------------
# H4 — settings loader (``experiments/SettingsLoader.java:29-81``): the
# reference drives every experiment from a java.util.Properties file
# (init.properties). ``parse_properties`` reproduces Properties.load's
# documented line format (a public Java SE spec): '#'/'!' comments,
# '='/':'/ whitespace key terminators, backslash line continuation,
# \t \n \r \f \\ and \\uXXXX escapes. ``Settings`` resolves the keys
# SettingsLoader reads, with its defaults (retrieve.num_wanted -> 1000,
# qsim.numintervals -> 5; qpp.numtopdocs has NO default there — the
# reference NPEs when absent, we surface None).
# ---------------------------------------------------------------------------

_PROP_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "f": "\f"}


def _prop_unescape(s: str) -> str:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_PROP_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _odd_trailing_backslashes(line: str) -> bool:
    k = 0
    while k < len(line) and line[-1 - k] == "\\":
        k += 1
    return k % 2 == 1


def parse_properties(text: str) -> dict[str, str]:
    """java.util.Properties ``load`` line format -> {key: value}.
    Later duplicate keys overwrite earlier ones (Hashtable.put)."""
    props: dict[str, str] = {}
    lines = text.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i].rstrip("\r").lstrip(" \t\f")
        i += 1
        if not line or line[0] in "#!":
            continue
        while _odd_trailing_backslashes(line) and i < len(lines):
            line = line[:-1] + lines[i].rstrip("\r").lstrip(" \t\f")
            i += 1
        if _odd_trailing_backslashes(line):  # EOF continuation: drop it
            line = line[:-1]
        # key: up to the first unescaped '=', ':' or whitespace
        j, n = 0, len(line)
        while j < n:
            c = line[j]
            if c == "\\":
                j += 2
                continue
            if c in "=:" or c in " \t\f":
                break
            j += 1
        key = _prop_unescape(line[:j])
        rest = line[j:]
        k = 0
        while k < len(rest) and rest[k] in " \t\f":
            k += 1
        if k < len(rest) and rest[k] in "=:":
            k += 1
            while k < len(rest) and rest[k] in " \t\f":
                k += 1
        props[key] = _prop_unescape(rest[k:])
    return props


@dataclass(frozen=True)
class Settings:
    """Resolved experiment settings (the SettingsLoader surface)."""

    props: dict[str, str]
    index_dir: str | None       # index.dir (the searcher's directory)
    num_wanted: int             # retrieve.num_wanted, default 1000
    qpp_top_k: int | None       # qpp.numtopdocs (no reference default)
    qpp_metric: str | None      # qpp.metric -> correlation-metric map
    qpp_method: str | None      # qpp.method -> QPP-method map
    qsim_intervals: int         # qsim.numintervals, default 5

    @classmethod
    def from_text(cls, text: str) -> "Settings":
        p = parse_properties(text)
        top = p.get("qpp.numtopdocs")
        return cls(
            props=p,
            index_dir=p.get("index.dir"),
            num_wanted=int(p.get("retrieve.num_wanted", "1000")),
            qpp_top_k=int(top) if top is not None else None,
            qpp_metric=p.get("qpp.metric"),
            qpp_method=p.get("qpp.method"),
            qsim_intervals=int(p.get("qsim.numintervals", "5")),
        )

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.props.get(key, default)

    def engine_config(self, base: EngineConfig = DEFAULT) -> EngineConfig:
        """The searcher-side settings applied onto an EngineConfig."""
        from dataclasses import replace

        return replace(base, num_wanted=self.num_wanted)


def load_settings(path: str) -> Settings:
    """H4 — read an init.properties file into a ``Settings``."""
    # SettingsLoader passes a FileReader (platform charset, utf-8 on any
    # modern JVM) rather than the latin-1 InputStream overload.
    with open(path, encoding="utf-8") as f:
        return Settings.from_text(f.read())

# Default scale-factor directory for local runs (driver contract).
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
