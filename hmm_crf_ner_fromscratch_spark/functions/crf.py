"""Linear-chain CRF with CRF++-style feature templates: model structures,
vectorized float32 Viterbi decode, and a pure-Python oracle decoder.

Semantics reproduced from the reference (``crf_ner.py``), re-expressed --
not transcribed -- for NumPy + Spark:

* 21 hardcoded templates (``crf_ner.py:16-40``): 10 unigram rules
  U00..U09, 10 observation-dependent bigram rules B00..B09 (same offset
  specs), one pure transition rule "B".
* feature keys (``crf_ner.py:133-147``): ``"{prefix}:{obs}_{tag}"`` for U,
  ``"{prefix}:{obs}_{prev}_{cur}"`` for B_obs, ``"B:{prev}_{cur}"`` for
  B_pure; obs = words at the rule's offsets joined by "/", out-of-range
  offsets read "BOS"/"EOS" (``crf_ner.py:120-128``).
* decode DP (``crf_ner.py:371-512``): potentials[k,j] = sum of B_obs rule
  weights (in template order) + B_pure[k,j], then + U_vec[j]; explicit
  START features at t=0 and STOP transition at termination; ``torch.max``
  = first-index argmax; float32 arithmetic throughout (weights are float32,
  ``crf_ner.py:602``). Our accumulation follows the same per-cell order,
  so results are bit-identical to a float32 re-execution of the reference.
* determinism fix (SURVEY SS1.3): the reference's tag order comes from
  ``list(tag_set)`` (unstable); we pin first-occurrence order.

The model keeps a *structured* registry (feature -> (rule, obs, prev,
cur, tag) fields) rather than only the flat string dict, so decode-time
lookups are prebuilt into per-(rule, obs) weight vectors / sparse blocks
without re-parsing key strings.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

START_TAG = "<START>"
STOP_TAG = "<STOP>"

# (prefix, offsets) in template order -- crf_ner.py:16-40
U_TEMPLATES: list[tuple[str, tuple[int, ...]]] = [
    ("U00", (-2,)), ("U01", (-1,)), ("U02", (0,)), ("U03", (1,)), ("U04", (2,)),
    ("U05", (-2, -1)), ("U06", (-1, 0)), ("U07", (-1, 1)), ("U08", (0, 1)),
    ("U09", (1, 2)),
]
B_TEMPLATES: list[tuple[str, tuple[int, ...]]] = [
    ("B00", (-2,)), ("B01", (-1,)), ("B02", (0,)), ("B03", (1,)), ("B04", (2,)),
    ("B05", (-2, -1)), ("B06", (-1, 0)), ("B07", (-1, 1)), ("B08", (0, 1)),
    ("B09", (1, 2)),
]


# ---------------------------------------------------------------------
# Observation transforms (extended templates). The reference's templates
# are purely lexical (identity transform "w"); the extended set adds the
# standard NER generalization features -- word shape, lowercase, and
# character prefixes/suffixes -- which fire on UNSEEN words too. Each
# transform is one Python function used by BOTH the Spark registry build
# (via a vectorized pandas UDF) and the decode/train kernels, so feature
# keys agree everywhere by construction.
# ---------------------------------------------------------------------

def word_shape(w: str) -> str:
    """Collapsed word shape: uppercase run -> X, lowercase -> x,
    digit -> d, other chars kept; consecutive duplicates collapsed
    ("McDonald's" -> "XxXx'x", "1984" -> "d")."""
    out: list[str] = []
    last = ""
    for ch in w:
        c = "X" if ch.isupper() else "x" if ch.islower() else "d" if ch.isdigit() else ch
        if c != last:
            out.append(c)
            last = c
    return "".join(out)


# Process-global word -> cluster-bitstring maps for the ``cluster:NAME``
# xform. The maps travel WITH the model (CRFModel.cluster_maps) and are
# (re)registered by DecodeTables/_TrainTables init in each worker
# process, so kernel-built and Spark-built feature keys agree.
CLUSTER_MAPS: dict[str, dict[str, str]] = {}


def register_cluster_maps(maps: dict[str, dict[str, str]] | None) -> None:
    if maps:
        CLUSTER_MAPS.update(maps)


def apply_xform(word: str, xform: str) -> str:
    if xform == "w":
        return word
    if xform == "shape":
        return word_shape(word)
    if xform == "lower":
        return word.lower()
    if xform.startswith("pre"):
        return word[: int(xform[3:])]
    if xform.startswith("suf"):
        return word[-int(xform[3:]):]
    if xform.startswith("cluster:"):
        # BOS/EOS padding stays itself (boundary info beats a shared
        # <unk> bucket); out-of-vocabulary words share one <unk> class.
        if word in ("BOS", "EOS"):
            return word
        m = CLUSTER_MAPS.get(xform[8:])
        if m is None:
            raise ValueError(
                f"cluster map {xform[8:]!r} not registered -- decode/train "
                "with a model whose cluster_maps carries it"
            )
        return m.get(word, "<unk>")
    raise ValueError(f"unknown xform {xform!r}")


def normalize_templates(tpls) -> list[tuple[str, tuple[int, ...], str]]:
    """Accept (prefix, offsets) 2-tuples (identity transform) or
    (prefix, offsets, xform) 3-tuples; return normalized 3-tuples."""
    out = []
    for t in tpls:
        if len(t) == 2:
            out.append((t[0], tuple(t[1]), "w"))
        else:
            out.append((t[0], tuple(t[1]), t[2]))
    return out


# Extended unigram template set: the 10 reference rules plus shape /
# lowercase / prefix / suffix generalization rules. Bigram templates stay
# the reference set (observation-bigram features over transforms explode
# the feature space for little gain).
EXTENDED_U_TEMPLATES: list[tuple[str, tuple[int, ...], str]] = (
    normalize_templates(U_TEMPLATES)
    + [
        ("US1", (-1,), "shape"), ("US2", (0,), "shape"), ("US3", (1,), "shape"),
        ("US4", (-1, 0), "shape"), ("US5", (0, 1), "shape"),
        ("UL0", (0,), "lower"),
        ("UP2", (0,), "pre2"), ("UP3", (0,), "pre3"), ("UP4", (0,), "pre4"),
        ("UX2", (0,), "suf2"), ("UX3", (0,), "suf3"), ("UX4", (0,), "suf4"),
    ]
)


def cluster_u_templates(
    map_names: tuple[str, ...] = ("c4", "c6", "c10"),
    include_bigrams: bool = True,
) -> list[tuple[str, tuple[int, ...], str]]:
    """EXTENDED_U_TEMPLATES plus Brown-cluster features at several
    hierarchy granularities (the Koo/Turian recipe: cluster-id unigrams
    over a -1..+1 window per prefix length, optionally plus local
    bigrams at the coarsest level -- bigrams add a large sparse cross
    product; measured to destabilize full-batch Adagrad on CoNLL, see
    BENCH/BASELINE.md quality runs). ``map_names`` must match keys of
    the model's cluster_maps."""
    tpls = list(EXTENDED_U_TEMPLATES)
    for name in map_names:
        xf = f"cluster:{name}"
        tpls += [
            (f"UK{name}a", (-1,), xf),
            (f"UK{name}b", (0,), xf),
            (f"UK{name}c", (1,), xf),
        ]
    if include_bigrams:
        tpls.append((f"UK{map_names[0]}d", (-1, 0), f"cluster:{map_names[0]}"))
        tpls.append((f"UK{map_names[0]}e", (0, 1), f"cluster:{map_names[0]}"))
    return tpls


def gazetteer_u_templates(
    base=None, map_name: str = "gaz"
) -> list[tuple[str, tuple[int, ...], str]]:
    """A template set plus gazetteer-membership features: the ``gaz``
    model-carried map (operators/crf.py::mine_gazetteer) sends each word
    to the '|'-joined set of entity types whose gold training spans
    contain it ('<unk>' otherwise), and these rules fire on that class at
    a -1..+1 window plus the two local bigrams (boundary evidence: an
    entity word FOLLOWED by a non-member is where spans end). Same
    mechanism as cluster features, so decode stays self-contained.
    ``base`` defaults to cluster_u_templates() -- the round-3 quality
    config this stacks on."""
    tpls = list(base if base is not None else cluster_u_templates())
    xf = f"cluster:{map_name}"
    tpls += [
        ("UGa", (-1,), xf), ("UGb", (0,), xf), ("UGc", (1,), xf),
        ("UGd", (-1, 0), xf), ("UGe", (0, 1), xf),
    ]
    return tpls


def word_at(words: list[str], idx: int) -> str:
    """BOS/EOS-padded positional read (crf_ner.py:120-128)."""
    if 0 <= idx < len(words):
        return words[idx]
    return "BOS" if idx < 0 else "EOS"


def obs_string(
    words: list[str], pos: int, offsets: tuple[int, ...], xform: str = "w"
) -> str:
    if xform == "w":
        return "/".join(word_at(words, pos + o) for o in offsets)
    return "/".join(apply_xform(word_at(words, pos + o), xform) for o in offsets)


@dataclass
class CRFModel:
    """Driver-side CRF artifact.

    ``features`` is the structured registry: parallel lists over feature id
    of (kind, rule_idx, obs, prev_tag, cur_tag); kind 'U' uses (rule, obs,
    cur), 'BO' uses (rule, obs, prev, cur), 'BP' uses (prev, cur).
    ``weights`` is float32 (crf_ner.py:602).
    """

    tags: list[str]  # actual tags, pinned first-occurrence order
    feature_index: dict[str, int]
    kinds: list[str]
    rule_idxs: list[int]
    obss: list[str]
    prevs: list[str]
    curs: list[str]
    weights: np.ndarray = field(default=None)
    # template sets (normalized 3-tuples); default = the reference's 21
    # hardcoded templates. The extended quality mode passes
    # EXTENDED_U_TEMPLATES at registry-build time.
    u_templates: list = None
    b_templates: list = None
    # word -> cluster-bitstring maps backing any ``cluster:NAME`` xform in
    # the templates (Brown-style classes from operators/clusters.py);
    # carried by the model so decode is self-contained.
    cluster_maps: dict = None

    def __post_init__(self):
        if self.weights is None:
            self.weights = np.zeros(len(self.feature_index), dtype=np.float32)
        self.weights = np.asarray(self.weights, dtype=np.float32)
        self.u_templates = normalize_templates(self.u_templates or U_TEMPLATES)
        self.b_templates = normalize_templates(self.b_templates or B_TEMPLATES)
        register_cluster_maps(self.cluster_maps)

    @property
    def n_features(self) -> int:
        return len(self.feature_index)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "weights.npy"), self.weights)
        meta = {
            "tags": self.tags,
            "feature_index": self.feature_index,
            "kinds": self.kinds,
            "rule_idxs": self.rule_idxs,
            "obss": self.obss,
            "prevs": self.prevs,
            "curs": self.curs,
            "u_templates": [[p, list(o), x] for p, o, x in self.u_templates],
            "b_templates": [[p, list(o), x] for p, o, x in self.b_templates],
        }
        if self.cluster_maps:
            meta["cluster_maps"] = self.cluster_maps
        with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, path: str) -> "CRFModel":
        with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        return cls(weights=np.load(os.path.join(path, "weights.npy")), **meta)


def build_feature_key(
    kind, rule_idx, obs, prev, cur, u_templates=None, b_templates=None
) -> str:
    """Reference-format flat key (crf_ner.py:133-147)."""
    if kind == "U":
        return f"{(u_templates or U_TEMPLATES)[rule_idx][0]}:{obs}_{cur}"
    if kind == "BO":
        return f"{(b_templates or B_TEMPLATES)[rule_idx][0]}:{obs}_{prev}_{cur}"
    return f"B:{prev}_{cur}"


class DecodeTables:
    """Per-(rule, obs) lookup tables prebuilt from a CRFModel for fast
    vectorized decode; mirrors the reference's accumulation structure."""

    def __init__(self, model: CRFModel):
        # broadcast unpickle does not re-run __post_init__, so worker
        # processes (re)register the model's cluster maps here
        register_cluster_maps(model.cluster_maps)
        K = len(model.tags)
        self.K = K
        self.tags = model.tags
        self.u_templates = model.u_templates
        self.b_templates = model.b_templates
        tag_idx = {t: i for i, t in enumerate(model.tags)}
        w = model.weights

        # U: (rule, obs) -> float32 vector over actual tags; STOP handled
        # as a separate scalar map (rule, obs) -> w.
        self.u_vec: dict[tuple[int, str], np.ndarray] = {}
        self.u_stop: dict[tuple[int, str], np.float32] = {}
        # B_obs: (rule, obs) -> list of (prev_idx, cur_idx, w) arrays over
        # actual x actual; START-row and STOP-column kept separately.
        self.bo_cells: dict[tuple[int, str], list] = {}
        self.bo_start: dict[tuple[int, str], np.ndarray] = {}  # vector over cur
        self.bo_stop: dict[tuple[int, str], np.ndarray] = {}  # vector over prev
        # B_pure dense blocks.
        self.bp = np.zeros((K, K), dtype=np.float32)
        self.bp_start = np.zeros(K, dtype=np.float32)  # START -> cur
        self.bp_stop = np.zeros(K, dtype=np.float32)  # prev -> STOP

        for fid in range(model.n_features):
            kind = model.kinds[fid]
            weight = w[fid]
            if kind == "U":
                key = (model.rule_idxs[fid], model.obss[fid])
                cur = model.curs[fid]
                if cur == STOP_TAG:
                    self.u_stop[key] = self.u_stop.get(key, np.float32(0.0)) + weight
                elif cur in tag_idx:
                    vec = self.u_vec.get(key)
                    if vec is None:
                        vec = np.zeros(K, dtype=np.float32)
                        self.u_vec[key] = vec
                    vec[tag_idx[cur]] += weight
            elif kind == "BO":
                key = (model.rule_idxs[fid], model.obss[fid])
                prev, cur = model.prevs[fid], model.curs[fid]
                if prev == START_TAG and cur in tag_idx:
                    vec = self.bo_start.get(key)
                    if vec is None:
                        vec = np.zeros(K, dtype=np.float32)
                        self.bo_start[key] = vec
                    vec[tag_idx[cur]] += weight
                elif cur == STOP_TAG and prev in tag_idx:
                    vec = self.bo_stop.get(key)
                    if vec is None:
                        vec = np.zeros(K, dtype=np.float32)
                        self.bo_stop[key] = vec
                    vec[tag_idx[prev]] += weight
                elif prev in tag_idx and cur in tag_idx:
                    self.bo_cells.setdefault(key, []).append(
                        (tag_idx[prev], tag_idx[cur], weight)
                    )
            else:  # BP
                prev, cur = model.prevs[fid], model.curs[fid]
                if prev == START_TAG and cur in tag_idx:
                    self.bp_start[tag_idx[cur]] += weight
                elif cur == STOP_TAG and prev in tag_idx:
                    self.bp_stop[tag_idx[prev]] += weight
                elif prev in tag_idx and cur in tag_idx:
                    self.bp[tag_idx[prev], tag_idx[cur]] += weight

    # -- per-position builders (all float32, reference accumulation order) --

    def u_at(self, words, pos) -> np.ndarray:
        v = np.zeros(self.K, dtype=np.float32)
        for r, (_, offs, xf) in enumerate(self.u_templates):
            vec = self.u_vec.get((r, obs_string(words, pos, offs, xf)))
            if vec is not None:
                v += vec
        return v

    def u_stop_at(self, words, pos) -> np.float32:
        s = np.float32(0.0)
        for r, (_, offs, xf) in enumerate(self.u_templates):
            x = self.u_stop.get((r, obs_string(words, pos, offs, xf)))
            if x is not None:
                s += x
        return s

    def start_scores(self, words) -> np.ndarray:
        """dp[0]: U at pos 0 + B_obs(START->cur) + B_pure(START->cur),
        matching crf_ner.py:396-424 accumulation order."""
        v = self.u_at(words, 0).copy()
        for r, (_, offs, xf) in enumerate(self.b_templates):
            vec = self.bo_start.get((r, obs_string(words, 0, offs, xf)))
            if vec is not None:
                v += vec
        v += self.bp_start
        return v

    def potentials_at(self, words, pos) -> np.ndarray:
        """(K, K) transition potentials at position pos >= 1 plus the U
        broadcast, matching crf_ner.py:427-458."""
        trans = np.zeros((self.K, self.K), dtype=np.float32)
        for r, (_, offs, xf) in enumerate(self.b_templates):
            cells = self.bo_cells.get((r, obs_string(words, pos, offs, xf)))
            if cells:
                for pi, ci, wt in cells:
                    trans[pi, ci] += wt
        trans += self.bp
        return trans + self.u_at(words, pos)[None, :]

    def stop_scores(self, words) -> np.ndarray:
        """Transition-to-STOP vector at pos = len(words)
        (crf_ner.py:469-496)."""
        T = len(words)
        v = np.zeros(self.K, dtype=np.float32)
        for r, (_, offs, xf) in enumerate(self.b_templates):
            vec = self.bo_stop.get((r, obs_string(words, T, offs, xf)))
            if vec is not None:
                v += vec
        v += self.bp_stop
        v += self.u_stop_at(words, T)
        return v


def viterbi_decode_crf(words: list[str], tables: DecodeTables) -> list[str]:
    """Vectorized float32 Viterbi; bit-matches the reference decode math."""
    K = tables.K
    T = len(words)
    if T == 0 or K == 0:
        return []
    bp = np.zeros((T, K), dtype=np.int64)
    dp = tables.start_scores(words)
    for t in range(1, T):
        combined = dp[:, None] + tables.potentials_at(words, t)
        bp[t] = np.argmax(combined, axis=0)
        dp = combined[bp[t], np.arange(K)]
    final = dp + tables.stop_scores(words)
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(final))
    for t in range(T - 2, -1, -1):
        path[t] = bp[t + 1][path[t + 1]]
    return [tables.tags[i] for i in path]


def build_obs_lists(
    words: list[str], templates: list[tuple[str, tuple[int, ...], str]]
) -> list[list[str]]:
    """Per-template observation strings for positions 0..T (incl. STOP):
    one padded word list, one transformed copy per distinct non-identity
    transform (shared across templates), each template's sequence a list
    slice (single offset) or zip-join of slices. Exactly equals
    ``[obs_string(words, pos, offs, xf) for pos in range(T + 1)]``."""
    T = len(words)
    min_off = min((min(offs) for _, offs, _ in templates if offs), default=0)
    max_off = max((max(offs) for _, offs, _ in templates if offs), default=0)
    L = max(-min_off, 0)
    R = max(max_off, 0)
    padded = ["BOS"] * L + list(words) + ["EOS"] * (R + 1)
    pads: dict[str, list[str]] = {}
    out = []
    for _, offs, xf in templates:
        p = pads.get(xf)
        if p is None:
            p = padded if xf == "w" else [apply_xform(w, xf) for w in padded]
            pads[xf] = p
        if len(offs) == 1:
            o = offs[0] + L
            out.append(p[o : o + T + 1])
        else:
            slices = [p[o + L : o + L + T + 1] for o in offs]
            out.append(["/".join(ws) for ws in zip(*slices)])
    return out


def viterbi_decode_crf_batch(
    token_lists: list, tables: DecodeTables
) -> list[list[str]]:
    """Batch decoder: identical results to per-sentence
    :func:`viterbi_decode_crf` (same piece vectors summed in the same rule
    order -> bit-equal float32), but per-(rule, obs) work is memoized
    across the WHOLE batch and U-vector assembly is vectorized:

      * for each rule, every unique obs string is looked up once; the
        per-position U matrix is a sum of 10 fancy-indexed piece matrices;
      * most positions have NO observation-dependent bigram features
        (B_obs keys exist only for gold-path contexts), so their (K, K)
        transition block is exactly the shared B_pure matrix -- only the
        exceptional positions build a custom matrix.

    This removes the per-position python/dict overhead that made naive CRF
    decode ~40x slower than the HMM path.
    """
    K = tables.K
    if K == 0:
        return [[] for _ in token_lists]
    u_tpls, b_tpls = tables.u_templates, tables.b_templates
    n_rules_u = len(u_tpls)
    zero_vec = np.zeros(K, dtype=np.float32)

    out: list[list[str]] = [None] * len(token_lists)
    sent_idx = [i for i, t in enumerate(token_lists) if len(t) > 0]
    for i, t in enumerate(token_lists):
        if len(t) == 0:
            out[i] = []
    if not sent_idx:
        return out

    # per-rule memo caches for this batch
    u_cache: list[dict] = [dict() for _ in range(n_rules_u)]
    us_cache: list[dict] = [dict() for _ in range(n_rules_u)]
    bo_cache: list[dict] = [dict() for _ in range(len(b_tpls))]
    bostop_cache: list[dict] = [dict() for _ in range(len(b_tpls))]

    all_tpls = u_tpls + b_tpls

    for i in sent_idx:
        words = token_lists[i]
        T = len(words)
        obs_per_tpl = build_obs_lists(words, all_tpls)
        u_obs = obs_per_tpl[:n_rules_u]
        b_obs = obs_per_tpl[n_rules_u:]

        # --- U matrix for positions 0..T-1 and STOP scalar at T ---
        U = np.zeros((T, K), dtype=np.float32)
        u_stop = np.float32(0.0)
        for r in range(n_rules_u):
            cache, scache = u_cache[r], us_cache[r]
            vec_map = tables.u_vec
            olist = u_obs[r]
            for t in range(T):
                obs = olist[t]
                v = cache.get(obs)
                if v is None:
                    v = vec_map.get((r, obs), zero_vec)
                    cache[obs] = v
                if v is not zero_vec:
                    U[t] += v
            obs = olist[T]
            s = scache.get(obs)
            if s is None:
                s = tables.u_stop.get((r, obs), np.float32(0.0))
                scache[obs] = s
            u_stop = u_stop + s

        # --- start vector ---
        dp = U[0].copy()
        for r in range(len(b_tpls)):
            vec = tables.bo_start.get((r, b_obs[r][0]))
            if vec is not None:
                dp += vec
        dp += tables.bp_start

        # --- recursion ---
        bp = np.zeros((T, K), dtype=np.int64)
        rng = np.arange(K)
        for t in range(1, T):
            trans = None
            for r in range(len(b_tpls)):
                obs = b_obs[r][t]
                cache = bo_cache[r]
                cells = cache.get(obs, False)
                if cells is False:
                    cells = tables.bo_cells.get((r, obs))
                    cache[obs] = cells
                if cells:
                    if trans is None:
                        trans = np.zeros((K, K), dtype=np.float32)
                    for pi, ci, wt in cells:
                        trans[pi, ci] += wt
            if trans is None:
                pots = tables.bp + U[t][None, :]
            else:
                trans += tables.bp
                pots = trans + U[t][None, :]
            combined = dp[:, None] + pots
            bp[t] = np.argmax(combined, axis=0)
            dp = combined[bp[t], rng]

        # --- termination ---
        stop = None
        for r in range(len(b_tpls)):
            obs = b_obs[r][T]
            cache = bostop_cache[r]
            vec = cache.get(obs, False)
            if vec is False:
                vec = tables.bo_stop.get((r, obs))
                cache[obs] = vec
            if vec is not None:
                if stop is None:
                    stop = np.zeros(K, dtype=np.float32)
                stop += vec
        if stop is None:
            stop = tables.bp_stop.copy()
        else:
            stop += tables.bp_stop
        stop += u_stop
        final = dp + stop
        path = np.zeros(T, dtype=np.int64)
        path[T - 1] = int(np.argmax(final))
        for t in range(T - 2, -1, -1):
            path[t] = bp[t + 1][path[t + 1]]
        out[i] = [tables.tags[j] for j in path]
    return out


# ---------------------------------------------------------------------
# Pure-Python oracle decoder (test-only): dict lookups on flat string
# keys, float32 scalar arithmetic, structured exactly like the reference
# decode loop (crf_ner.py:371-512). Independent of DecodeTables.
# ---------------------------------------------------------------------

def oracle_decode(
    words: list[str],
    weights: np.ndarray,
    feature_index: dict[str, int],
    tags: list[str],
) -> list[str]:
    f32 = np.float32
    K, T = len(tags), len(words)
    if T == 0 or K == 0:
        return []
    w = np.asarray(weights, dtype=np.float32)

    def lookup(key):
        fid = feature_index.get(key)
        return w[fid] if fid is not None else None

    def u_scores(pos, tag_list):
        out = [f32(0.0)] * len(tag_list)
        for prefix, offs in U_TEMPLATES:
            obs = obs_string(words, pos, offs)
            for j, tag in enumerate(tag_list):
                x = lookup(f"{prefix}:{obs}_{tag}")
                if x is not None:
                    out[j] = out[j] + x
        return out

    # init
    dp = u_scores(0, tags)
    for prefix, offs in B_TEMPLATES:
        obs = obs_string(words, 0, offs)
        for j, tag in enumerate(tags):
            x = lookup(f"{prefix}:{obs}_{START_TAG}_{tag}")
            if x is not None:
                dp[j] = dp[j] + x
    for j, tag in enumerate(tags):
        x = lookup(f"B:{START_TAG}_{tag}")
        if x is not None:
            dp[j] = dp[j] + x

    bp = [[0] * K for _ in range(T)]
    for t in range(1, T):
        trans = [[f32(0.0)] * K for _ in range(K)]
        for prefix, offs in B_TEMPLATES:
            obs = obs_string(words, t, offs)
            for k, ptag in enumerate(tags):
                for j, ctag in enumerate(tags):
                    x = lookup(f"{prefix}:{obs}_{ptag}_{ctag}")
                    if x is not None:
                        trans[k][j] = trans[k][j] + x
        for k, ptag in enumerate(tags):
            for j, ctag in enumerate(tags):
                x = lookup(f"B:{ptag}_{ctag}")
                if x is not None:
                    trans[k][j] = trans[k][j] + x
        uni = u_scores(t, tags)
        new_dp = [f32(-np.inf)] * K
        for j in range(K):
            best, best_k = f32(-np.inf), 0
            for k in range(K):
                cur = dp[k] + (trans[k][j] + uni[j])
                if cur > best:
                    best, best_k = cur, k
            new_dp[j] = best
            bp[t][j] = best_k
        dp = new_dp

    stop = [f32(0.0)] * K
    for prefix, offs in B_TEMPLATES:
        obs = obs_string(words, T, offs)
        for k, ptag in enumerate(tags):
            x = lookup(f"{prefix}:{obs}_{ptag}_{STOP_TAG}")
            if x is not None:
                stop[k] = stop[k] + x
    for k, ptag in enumerate(tags):
        x = lookup(f"B:{ptag}_{STOP_TAG}")
        if x is not None:
            stop[k] = stop[k] + x
    u_stop = f32(0.0)
    for prefix, offs in U_TEMPLATES:
        obs = obs_string(words, T, offs)
        x = lookup(f"{prefix}:{obs}_{STOP_TAG}")
        if x is not None:
            u_stop = u_stop + x
    best, best_j = f32(-np.inf), 0
    for j in range(K):
        cur = dp[j] + (stop[j] + u_stop)
        if cur > best:
            best, best_j = cur, j
    path = [0] * T
    path[T - 1] = best_j
    for t in range(T - 2, -1, -1):
        path[t] = bp[t + 1][path[t + 1]]
    return [tags[i] for i in path]
