"""Text-analysis stages over the ``documents`` table.

Large-scale training-data-pipeline text operators, each a vectorized
``map_batches`` stage over the raw document table:

* ``token_stats``       — whitespace token counting + byte/char stats
* ``quality_scores``    — length / stopword-ratio / mean-token-length
                          quality signals
* ``fingerprints``      — MD5 document fingerprint (content address)
* ``rolling_fingerprints`` — 64-bit polynomial rolling-hash winnowing
                          fingerprint (SQL-inexpressible; rows-only)
* ``lang_counts``       — grouped count by labeled language
* ``lang_id``           — character-n-gram heuristic language
                          prediction (no label peeking)

Exact-match discipline: token counts use ``text.split(' ')`` which is
element-for-element identical to DuckDB ``string_split(text, ' ')``
(both keep empty strings); ratios are single float64 divisions of
integers, bit-identical across engines.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# token_stats
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: word runs OR single non-word non-space marks
#: (same RE2-compatible pattern both here and in the DuckDB oracle)
BPE_ISH_PATTERN = "[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"
_BPE_RE = None  # compiled once per worker process


def _token_stats_batch(batch: pa.Table) -> pa.Table:
    global _BPE_RE
    if _BPE_RE is None:
        import re
        _BPE_RE = re.compile(BPE_ISH_PATTERN)
    texts = batch["text"].to_pylist()
    n_tokens = np.fromiter((len(t.split(" ")) for t in texts),
                           dtype=np.int64, count=len(texts))
    n_bpe = np.fromiter((len(_BPE_RE.findall(t)) for t in texts),
                        dtype=np.int64, count=len(texts))
    n_bytes = np.fromiter((len(t.encode("utf-8")) for t in texts),
                          dtype=np.int64, count=len(texts))
    n_chars = np.fromiter((len(t) for t in texts),
                          dtype=np.int64, count=len(texts))
    return pa.table({"doc_id": batch["doc_id"],
                     "n_tokens": pa.array(n_tokens),
                     "n_bpe_tokens": pa.array(n_bpe),
                     "n_bytes": pa.array(n_bytes),
                     "n_chars_m": pa.array(n_chars)})


def token_stats_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc token-stat rows (the 100 TB form: sink with
    ``util.write_doc_output`` or consume streaming; never driver-wide)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_token_stats_batch, batch_format="pyarrow")


def token_stats(sf_dir: str) -> pd.DataFrame:
    """Driver-frame gate adapter over ``token_stats_ds`` (test scale)."""
    out = token_stats_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


TOKEN_STATS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
       strlen(text) AS n_bytes,
       length(text) AS n_chars_m
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# quality_scores
# ---------------------------------------------------------------------------

def _quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    n = len(texts)
    n_tok = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    alpha_chars = np.empty(n, dtype=np.int64)
    sw = set(STOPWORDS)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_tok[i] = len(toks)
        n_stop[i] = sum(1 for w in toks if w in sw)
        alpha_chars[i] = len(t) - t.count(" ")
    stop_ratio = n_stop / np.maximum(n_tok, 1)
    mean_tok_len = alpha_chars / np.maximum(n_tok, 1)
    return pa.table({"doc_id": batch["doc_id"],
                     "n_tokens": pa.array(n_tok),
                     "stopword_cnt": pa.array(n_stop),
                     "stopword_ratio": pa.array(stop_ratio),
                     "mean_token_len": pa.array(mean_tok_len)})


def quality_scores_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc quality rows (sink-able; see token_stats_ds)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_quality_batch, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> pd.DataFrame:
    out = quality_scores_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUALITY_SCORES_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '),
           w -> w IN {STOPWORDS!r})) AS stopword_cnt,
       len(list_filter(string_split(text, ' '),
           w -> w IN {STOPWORDS!r}))
         / CAST(GREATEST(len(string_split(text, ' ')), 1) AS DOUBLE)
         AS stopword_ratio,
       length(replace(text, ' ', ''))
         / CAST(GREATEST(len(string_split(text, ' ')), 1) AS DOUBLE)
         AS mean_token_len
FROM documents ORDER BY doc_id
"""


def quality_filter_stats(sf_dir: str, min_tokens: int = 40,
                         max_stop_ratio: float = 0.06) -> pd.DataFrame:
    """Composite filter → groupby: documents passing the quality gate
    (enough tokens, low stopword ratio), counted per language with
    total kept tokens. The filter predicate is computed from the same
    integer-derived ratios as ``quality_scores`` so the boundary is
    bit-identical to the SQL oracle."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])

    def gate(batch: pa.Table) -> pa.Table:
        q = _quality_batch(batch.select(["doc_id", "text"]))
        keep = (np.asarray(q["n_tokens"]) >= min_tokens) & \
               (np.asarray(q["stopword_ratio"]) <= max_stop_ratio)
        idx = np.flatnonzero(keep)
        df = pd.DataFrame({
            "lang": np.asarray(batch["lang"].to_pylist())[idx],
            "kept_docs": np.ones(len(idx), dtype=np.int64),
            "kept_tokens": np.asarray(q["n_tokens"])[idx],
        })
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(gate, batch_format="pyarrow")
             .groupby("lang")
             .aggregate(Sum("kept_docs", alias_name="kept_docs"),
                        Sum("kept_tokens", alias_name="kept_tokens")))
    out = agg.to_pandas()
    out["kept_docs"] = out["kept_docs"].astype(np.int64)
    out["kept_tokens"] = out["kept_tokens"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


QUALITY_FILTER_STATS_SQL = f"""
WITH q AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             w -> w IN {STOPWORDS!r}))
           / CAST(GREATEST(len(string_split(text, ' ')), 1) AS DOUBLE)
           AS stop_ratio
  FROM documents)
SELECT lang, COUNT(*) AS kept_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
FROM q WHERE n_tokens >= 40 AND stop_ratio <= 0.06
GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------

def _md5_batch(batch: pa.Table) -> pa.Table:
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fps, pa.string())})


def fingerprints_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc md5 fingerprints (sink-able)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_md5_batch, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> pd.DataFrame:
    out = fingerprints_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


FINGERPRINTS_SQL = """
SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# rolling_fingerprints — winnowing over a 64-bit polynomial rolling hash
# ---------------------------------------------------------------------------

_ROLL_BASE = np.uint64(1000003)
_WINDOW = 16


def _rolling_hashes(data: bytes) -> np.ndarray:
    """Hash of every _WINDOW-byte window via polynomial rolling hash
    (mod 2^64 by uint64 wraparound), fully vectorized: H[i] =
    sum_{j} b[i+j] * BASE^(W-1-j)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if len(b) < _WINDOW:
        b = np.pad(b, (0, _WINDOW - len(b)))
    with np.errstate(over="ignore"):
        powers = np.empty(_WINDOW, dtype=np.uint64)
        powers[-1] = 1
        for j in range(_WINDOW - 2, -1, -1):
            powers[j] = powers[j + 1] * _ROLL_BASE
        n_win = len(b) - _WINDOW + 1
        acc = np.zeros(n_win, dtype=np.uint64)
        for j in range(_WINDOW):
            acc += b[j:j + n_win] * powers[j]
    return acc


def _winnow_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = min rolling-window hash (winnowing with a
    single global window — a deterministic content sketch robust to
    local edits). The uint64 min is emitted as its two's-complement
    int64 view so the DuckDB oracle (HUGEINT arithmetic -> BIGNT cast)
    compares exactly."""
    ids, mins, n_windows = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        h = _rolling_hashes(t.encode("utf-8"))
        ids.append(d)
        mins.append(int(np.uint64(h.min()).astype(np.int64)))
        n_windows.append(len(h))
    return pa.table({"doc_id": pa.array(ids, batch["doc_id"].type),
                     "min_hash_i64": pa.array(mins, pa.int64()),
                     "n_windows": pa.array(n_windows, pa.int64())})


def rolling_fingerprints_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc winnowed rolling-hash sketches (sink-able)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_winnow_batch, batch_format="pyarrow")


def rolling_fingerprints(sf_dir: str) -> pd.DataFrame:
    out = rolling_fingerprints_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _rolling_fp_sql() -> str:
    """DuckDB oracle for ``rolling_fingerprints``: the byte stream is
    recovered via hex(encode(text)), each 16-byte window hash is the
    HUGEINT dot product with the precomputed BASE powers mod 2^64
    (identical to the numpy uint64 wraparound), minimized per doc with
    a list comprehension, and viewed as signed BIGINT on both sides."""
    w = _WINDOW
    powers = [pow(int(_ROLL_BASE), w - 1 - j, 1 << 64) for j in range(w)]
    terms = " + ".join(
        f"(CASE WHEN i + {j} < n THEN "
        f"('0x' || substr(hx, 2*(i+{j}) + 1, 2))::INT::HUGEINT "
        f"ELSE 0::HUGEINT END) * {powers[j]}::HUGEINT"
        for j in range(w))
    return f"""
WITH bt AS (
  SELECT doc_id, hex(encode(text)) AS hx, strlen(text)::BIGINT AS n,
         GREATEST(strlen(text)::BIGINT - {w - 1}, 1) AS n_win
  FROM documents),
h AS (
  SELECT doc_id, n_win,
         list_min([({terms}) % 18446744073709551616::HUGEINT
                   for i in range(0, n_win)]) AS hmin
  FROM bt)
SELECT doc_id,
       CASE WHEN hmin >= 9223372036854775808::HUGEINT
            THEN (hmin - 18446744073709551616::HUGEINT)::BIGINT
            ELSE hmin::BIGINT END AS min_hash_i64,
       n_win AS n_windows
FROM h ORDER BY doc_id
"""


ROLLING_FINGERPRINTS_SQL = _rolling_fp_sql()


# ---------------------------------------------------------------------------
# lang_counts (labeled) and lang_id (predicted, heuristic)
# ---------------------------------------------------------------------------

def lang_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir, columns=["lang"])
    out = (ds.groupby("lang").aggregate(Count(alias_name="doc_cnt"))
             .to_pandas())
    return out.sort_values("lang").reset_index(drop=True)


LANG_COUNTS_SQL = """
SELECT lang, COUNT(*) AS doc_cnt FROM documents GROUP BY lang ORDER BY lang
"""

# Character-bigram profiles per language: tiny fixed profiles of
# distinctive bigrams (a public-knowledge n-gram-heuristic LID — the
# classic Cavnar-Trenkle n-gram-rank approach, shrunk to a seed set).
_LANG_BIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "es": ("de", "la", "en", "el", "es", "os", "ón", "ar", "ue", "ci"),
    "fr": ("le", "de", "es", "en", "on", "re", "nt", "ou", "qu", "ai"),
    "de": ("er", "en", "ch", "de", "ei", "ie", "in", "te", "un", "sc"),
    "zh": ("的", "是", "了", "在", "人", "有", "我", "他", "这", "中"),
}


class LangId:
    """Actor-pool language identifier: per-actor, compile the bigram
    profiles into index maps ONCE (__init__), then score batches
    vectorized (__call__) — the ST-pattern from SURVEY.md §2.3.

    Scoring is one pandas ``str.contains`` pass per profile bigram
    (vectorized C substring search over the whole batch; bigram-in-
    gram-set == substring occurrence), then a single argmax: langs are
    iterated sorted so np.argmax's first-max rule IS the smallest-lang
    tie-break."""

    def __init__(self):
        self.langs = sorted(_LANG_BIGRAMS)
        self.profiles = [_LANG_BIGRAMS[l] for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().astype(str)
        hits = np.zeros((len(self.langs), len(s)), dtype=np.int64)
        for li, prof in enumerate(self.profiles):
            for g in prof:
                hits[li] += s.str.contains(g, regex=False).to_numpy()
        best = np.argmax(hits, axis=0)  # first max == smallest lang
        preds = np.asarray(self.langs, dtype=object)[best]
        return pa.table({"doc_id": batch["doc_id"],
                         "pred_lang": pa.array(list(preds), pa.string()),
                         "lang": batch["lang"]})


def _lang_agree(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    agree = pc.cast(pc.equal(batch["pred_lang"], batch["lang"]), pa.int64())
    return batch.append_column("agree", agree)


def lang_id_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc language predictions + agreement flag (sink-able)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])
    return (ds.map_batches(LangId, batch_format="pyarrow",
                           concurrency=(1, 4))
              .map_batches(_lang_agree, batch_format="pyarrow"))


def lang_id(sf_dir: str) -> pd.DataFrame:
    """Predicted language per document + agreement flag vs the label."""
    out = lang_id_ds(sf_dir).to_pandas()
    return out[["doc_id", "pred_lang", "lang", "agree"]].sort_values(
        "doc_id").reset_index(drop=True)


def _lang_id_sql() -> str:
    """DuckDB oracle for ``lang_id``: a bigram is 'hit' iff it occurs
    as a substring (== membership in the text's bigram set); argmax
    with ties to the lexicographically smallest language, exactly the
    LangId scoring loop. Profiles are injected from _LANG_BIGRAMS so
    both sides always share one table."""

    def lit(g: str) -> str:
        return "'" + g.replace("'", "''") + "'"

    vals = ", ".join(
        f"({lit(lang)}, [{', '.join(lit(g) for g in grams)}])"
        for lang, grams in sorted(_LANG_BIGRAMS.items()))
    return f"""
WITH profiles(cand, prof) AS (VALUES {vals}),
scored AS (
  SELECT d.doc_id, d.lang, p.cand,
         len(list_filter(p.prof, g -> contains(d.text, g))) AS hits
  FROM documents d CROSS JOIN profiles p),
ranked AS (
  SELECT doc_id, lang, cand, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, cand ASC) AS rn
  FROM scored)
SELECT doc_id, cand AS pred_lang, lang,
       CAST(cand = lang AS BIGINT) AS agree
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


# ---------------------------------------------------------------------------
# boilerplate n-gram detection — the CCNet/C4-style cleaning step:
# find token n-grams shared by many documents (nav bars, license
# headers, templated chrome) and measure each document's boilerplate
# fraction
# ---------------------------------------------------------------------------

BOILER_N = 4          # token n-gram width
BOILER_MIN_DF = 3     # "boilerplate" = appears in >= this many docs


def boilerplate_ngrams_ds(sf_dir: str, n: int = BOILER_N,
                          min_df: int = BOILER_MIN_DF) -> ray.data.Dataset:
    """Per-document boilerplate measurement: of the doc's token
    ``n``-gram windows, how many are "boilerplate" (the gram occurs in
    >= ``min_df`` distinct documents corpus-wide)? Returns (doc_id,
    n_windows, n_boiler) for every doc with >= n tokens.

    Two-pass global-stats broadcast (the tf-idf pattern): pass 1
    computes gram document-frequencies with a distinct-per-doc
    per-batch combiner (the shuffle is gram-vocabulary-sized, one row
    per distinct gram per block); only grams ABOVE the threshold come
    back to the driver — the boilerplate set is small by construction
    (a gram in >= min_df of N docs caps the set at n_windows·N/min_df)
    — and broadcast once via ``ray.put`` as a sorted array; pass 2
    scores each doc per batch with vectorized searchsorted membership.
    No per-doc state ever crosses the driver boundary: pass 1's
    aggregate executes eagerly (it feeds the broadcast), pass 2 is the
    returned lazy Dataset — sink with ``util.write_doc_output``."""
    import ray

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def _flat_grams(texts: list[str]):
        """Whole-batch gram building, no per-doc loop: flatten every
        token with its doc index, form grams by elementwise object-
        array concatenation over shifted views, and mask out windows
        that straddle a document boundary."""
        from .corpus import _flatten_tokens
        flat, doc_idx = _flatten_tokens(texts)
        if len(flat) < n:
            return (np.array([], dtype=object),
                    np.array([], dtype=np.int64))
        g = flat[:len(flat) - n + 1].copy()
        for j in range(1, n):
            g = g + " "
            g = g + flat[j:len(flat) - n + 1 + j]
        same_doc = doc_idx[:len(flat) - n + 1] == doc_idx[n - 1:]
        return g[same_doc], doc_idx[:len(flat) - n + 1][same_doc]

    def df_partial(batch: pa.Table) -> pa.Table:
        grams, gdoc = _flat_grams(batch["text"].to_pylist())
        if not len(grams):
            return pa.table({"gram": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        # distinct per doc: factorize + dedupe (doc, code) + bincount
        codes, uniq = pd.factorize(grams)
        uk = np.unique(gdoc * np.int64(len(uniq)) + codes)
        dfc = np.bincount(uk % len(uniq), minlength=len(uniq))
        return pa.table({"gram": pa.array(uniq, pa.string()),
                         "df": pa.array(dfc.astype(np.int64))})

    from ray.data.aggregate import Sum
    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("gram")
                .aggregate(Sum("df", alias_name="df")))
    hot = df_tab.filter(expr=f"df >= {min_df}").to_pandas()
    # an empty filtered Dataset drops its schema -> guard the column
    boiler = (hot["gram"].to_numpy(dtype=object) if "gram" in hot
              else np.array([], dtype=object))
    boiler.sort()
    broadcast = ray.put(boiler)

    def score(batch: pa.Table) -> pa.Table:
        bset = ray.get(broadcast)
        ids_arr = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        grams, gdoc = _flat_grams(batch["text"].to_pylist())
        wins = np.bincount(gdoc, minlength=len(ids_arr))
        if len(bset) and len(grams):
            pos = np.searchsorted(bset, grams)
            ok = ((pos < len(bset))
                  & (bset[np.minimum(pos, len(bset) - 1)] == grams))
            boil = np.bincount(gdoc[ok], minlength=len(ids_arr))
        else:
            boil = np.zeros(len(ids_arr), dtype=np.int64)
        has = wins > 0   # docs shorter than n tokens emit no row
        return pa.table({
            "doc_id": pa.array(ids_arr[has]),
            "n_windows": pa.array(wins[has].astype(np.int64)),
            "n_boiler": pa.array(boil[has].astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def boilerplate_ngrams(sf_dir: str, n: int = BOILER_N,
                       min_df: int = BOILER_MIN_DF) -> pd.DataFrame:
    """Driver-frame gate adapter over ``boilerplate_ngrams_ds``."""
    out = boilerplate_ngrams_ds(sf_dir, n, min_df).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _boiler_sql(n: int = BOILER_N, min_df: int = BOILER_MIN_DF) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT doc_id,
         array_to_string(list_slice(toks, s, s + {n} - 1), ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {n} + 1)) AS s
        FROM t)),
b AS (
  SELECT gram FROM w GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= {min_df})
SELECT w.doc_id,
       COUNT(*)::BIGINT AS n_windows,
       COUNT(*) FILTER (WHERE w.gram IN (SELECT gram FROM b))::BIGINT
         AS n_boiler
FROM w GROUP BY w.doc_id ORDER BY w.doc_id
"""


BOILERPLATE_NGRAMS_SQL = _boiler_sql()


# ---------------------------------------------------------------------------
# duplicate_spans — exact duplicated-substring detection (the span-level
# twin of document dedup: Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better", which removes repeated SPANS rather
# than whole documents)
# ---------------------------------------------------------------------------

DUPSPAN_N = 4        # token window width
DUPSPAN_MIN_DF = 2   # duplicated = the window occurs in >= 2 docs


def duplicate_spans(sf_dir: str, n: int = DUPSPAN_N,
                    min_df: int = DUPSPAN_MIN_DF) -> pd.DataFrame:
    """Maximal duplicated token spans per document: a token is COVERED
    when any length-``n`` window containing it occurs in >= ``min_df``
    distinct documents corpus-wide; spans are the maximal runs of
    covered tokens — (doc_id, span_start, span_end, span_len), token
    positions 1-based.  This is what a span-level deduper would cut.

    Shape: pass 1 is the boilerplate df aggregation (distinct-per-doc
    per-batch combiner, gram-vocabulary-sized shuffle); the qualifying
    gram set comes back sorted and is broadcast once (``ray.put`` +
    searchsorted membership — the dedup isolated-doc-filter lesson).
    Pass 2 marks hot windows per batch and merges covered tokens into
    islands fully vectorized (one np.unique over (doc, token) keys,
    boundaries where the sorted key step != 1).  At 100 TB the
    broadcast (result-sized for min_df=2) becomes a hash semi-join of
    window rows against the qualifying grams; pass 2 is unchanged."""
    import ray

    from .corpus import _flatten_tokens

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def _grams_pos(texts: list[str]):
        """(gram, doc_window_idx, 1-based in-doc start) per window."""
        flat, doc_idx = _flatten_tokens(texts)
        nw = len(flat) - n + 1
        if nw <= 0:
            e = np.array([], dtype=np.int64)
            return np.array([], dtype=object), e, e
        g = flat[:nw].copy()
        for j in range(1, n):
            g = g + " "
            g = g + flat[j:nw + j]
        counts = np.bincount(doc_idx, minlength=(doc_idx.max() + 1
                                                 if len(doc_idx) else 0))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        wdoc = doc_idx[:nw]
        s = np.arange(nw, dtype=np.int64) - starts[wdoc] + 1
        same_doc = wdoc == doc_idx[n - 1:]
        return g[same_doc], wdoc[same_doc], s[same_doc]

    def df_partial(batch: pa.Table) -> pa.Table:
        grams, gdoc, _s = _grams_pos(batch["text"].to_pylist())
        if not len(grams):
            return pa.table({"gram": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(grams)
        uk = np.unique(gdoc * np.int64(len(uniq)) + codes)
        dfc = np.bincount(uk % len(uniq), minlength=len(uniq))
        return pa.table({"gram": pa.array(uniq, pa.string()),
                         "df": pa.array(dfc.astype(np.int64))})

    from ray.data.aggregate import Sum
    df_tab = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("gram")
                .aggregate(Sum("df", alias_name="df")))
    hot = df_tab.filter(expr=f"df >= {min_df}").to_pandas()
    dup = (hot["gram"].to_numpy(dtype=object) if "gram" in hot
           else np.array([], dtype=object))
    dup.sort()
    broadcast = ray.put(dup)

    def spans(batch: pa.Table) -> pa.Table:
        dset = ray.get(broadcast)
        ids_arr = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        grams, gdoc, s = _grams_pos(batch["text"].to_pylist())
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "span_start": pa.array([], pa.int64()),
                          "span_end": pa.array([], pa.int64()),
                          "span_len": pa.array([], pa.int64())})
        if not (len(dset) and len(grams)):
            return empty
        pos = np.searchsorted(dset, grams)
        ok = ((pos < len(dset))
              & (dset[np.minimum(pos, len(dset) - 1)] == grams))
        if not ok.any():
            return empty
        hdoc, hs = gdoc[ok], s[ok]
        # covered (doc, token) keys, deduped; islands where the sorted
        # key step != 1 (doc changes always step by >= span gap + base)
        base = np.int64(int(hs.max()) + n + 2)
        cov = np.unique((hdoc.repeat(n) * base)
                        + np.repeat(hs, n)
                        + np.tile(np.arange(n, dtype=np.int64),
                                  len(hs)))
        brk = np.flatnonzero(np.diff(cov) != 1)
        first = np.concatenate([[0], brk + 1])
        last = np.concatenate([brk, [len(cov) - 1]])
        return pa.table({
            "doc_id": pa.array(ids_arr[(cov[first] // base)]),
            "span_start": pa.array(cov[first] % base),
            "span_end": pa.array(cov[last] % base),
            "span_len": pa.array(last - first + 1),
        })

    out = ds.map_batches(spans, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["doc_id", "span_start"])
            .reset_index(drop=True))


def _dupspan_sql(n: int = DUPSPAN_N, min_df: int = DUPSPAN_MIN_DF) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (
  SELECT doc_id, s,
         array_to_string(list_slice(toks, s, s + {n} - 1), ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {n} + 1)) AS s
        FROM t)),
b AS (
  SELECT gram FROM w GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) >= {min_df}),
hits AS (
  SELECT w.doc_id, w.s FROM w JOIN b USING (gram)),
cov AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, s + unnest(generate_series(0, {n} - 1)) AS tok
    FROM hits)),
isl AS (
  SELECT doc_id, tok,
         tok - ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tok) AS grp
  FROM cov)
SELECT doc_id,
       MIN(tok)::BIGINT AS span_start,
       MAX(tok)::BIGINT AS span_end,
       COUNT(*)::BIGINT AS span_len
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""


DUPLICATE_SPANS_SQL = _dupspan_sql()


# ---------------------------------------------------------------------------
# repetition_stats — Gopher-style within-document repetition signals
# ---------------------------------------------------------------------------

def _repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition signals (Rae et al. 2021, "Scaling Language
    Models" — the Gopher repetition filters), fully vectorized: one
    np.unique over the batch's concatenated (doc, token) keys, one
    over the (doc, bigram) keys — no per-doc Counter loops.

    Tie-break contract: among equally-frequent tokens/bigrams the
    lexicographically smallest wins (np.unique's sorted uniques ==
    DuckDB ``ORDER BY n DESC, tok ASC`` on ASCII content).
    """
    texts = batch["text"].to_pylist()
    n = len(texts)
    toks_per_doc = [t.split(" ") for t in texts]
    lens = np.fromiter((len(x) for x in toks_per_doc),
                       dtype=np.int64, count=n)
    flat = np.concatenate(
        [np.asarray(x, dtype=object) for x in toks_per_doc]
    ).astype(str)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

    def _per_doc_top(d_idx, values):
        """(count per doc of distinct vals, top value, top count)."""
        uniq, codes = np.unique(values, return_inverse=True)
        V = np.int64(len(uniq))
        key = d_idx * V + codes
        uk, cnt = np.unique(key, return_counts=True)
        d = uk // V
        c = uk % V
        n_distinct = np.bincount(d, minlength=n).astype(np.int64)
        # rank inside each doc by (count desc, token lexical asc):
        # codes are lexical ranks because np.unique sorts
        order = np.lexsort((c, -cnt, d))
        d_sorted = d[order]
        first = np.unique(d_sorted, return_index=True)[1]
        top_val = np.full(n, "", dtype=object)
        top_cnt = np.zeros(n, dtype=np.int64)
        hit_docs = d_sorted[first]
        top_val[hit_docs] = uniq[c[order][first]]
        top_cnt[hit_docs] = cnt[order][first]
        return n_distinct, top_val, top_cnt

    n_distinct, top_token, top_token_n = _per_doc_top(doc_idx, flat)

    # bigrams: drop each doc's last token for the left side, first
    # token for the right side, then join with a single space
    pos = np.arange(len(flat), dtype=np.int64)
    ends = np.cumsum(lens)
    is_last = np.zeros(len(flat), dtype=bool)
    is_last[ends - 1] = True
    is_first = np.zeros(len(flat), dtype=bool)
    is_first[ends - lens] = True
    left = flat[~is_last]
    right = flat[~is_first]
    grams = np.char.add(np.char.add(left.astype(str), " "),
                        right.astype(str))
    g_doc = doc_idx[~is_last]
    if len(grams):
        _, top_bigram, top_bigram_n = _per_doc_top(g_doc, grams)
    else:
        top_bigram = np.full(n, "", dtype=object)
        top_bigram_n = np.zeros(n, dtype=np.int64)

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": pa.array(lens),
        "n_distinct": pa.array(n_distinct),
        "dup_token_n": pa.array(lens - n_distinct),
        "top_token": pa.array(top_token.tolist(), type=pa.string()),
        "top_token_n": pa.array(top_token_n),
        "n_bigrams": pa.array(np.maximum(lens - 1, 0)),
        "top_bigram": pa.array(top_bigram.tolist(), type=pa.string()),
        "top_bigram_n": pa.array(top_bigram_n),
    })


def repetition_stats_ds(sf_dir: str) -> ray.data.Dataset:
    """Lazy per-doc repetition rows — the 100 TB form (sink with
    ``util.write_doc_output`` or feed a downstream filter); no shuffle,
    no driver materialization."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(_repetition_batch, batch_format="pyarrow")


def repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Driver-frame gate adapter over ``repetition_stats_ds``."""
    out = repetition_stats_ds(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


REPETITION_STATS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
tok AS (SELECT doc_id, unnest(l) AS tok FROM t),
tc AS (SELECT doc_id, tok, COUNT(*) AS n FROM tok GROUP BY 1, 2),
ttop AS (SELECT doc_id, tok, n, row_number() OVER
           (PARTITION BY doc_id ORDER BY n DESC, tok ASC) AS r FROM tc),
bg AS (SELECT doc_id,
              unnest(list_transform(range(1, len(l)),
                                    i -> l[i] || ' ' || l[i + 1])) AS gram
       FROM t),
bc AS (SELECT doc_id, gram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
btop AS (SELECT doc_id, gram, n, row_number() OVER
           (PARTITION BY doc_id ORDER BY n DESC, gram ASC) AS r FROM bc),
d AS (SELECT doc_id, len(l)::BIGINT AS n_tokens,
             len(list_distinct(l))::BIGINT AS n_distinct FROM t)
SELECT d.doc_id, d.n_tokens, d.n_distinct,
       (d.n_tokens - d.n_distinct)::BIGINT AS dup_token_n,
       tt.tok AS top_token, tt.n::BIGINT AS top_token_n,
       GREATEST(d.n_tokens - 1, 0)::BIGINT AS n_bigrams,
       COALESCE(bt.gram, '') AS top_bigram,
       COALESCE(bt.n, 0)::BIGINT AS top_bigram_n
FROM d
JOIN (SELECT * FROM ttop WHERE r = 1) tt USING (doc_id)
LEFT JOIN (SELECT * FROM btop WHERE r = 1) bt USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# per-source corpus quality report — the composition dashboard every
# multi-source training mix is tuned from
# ---------------------------------------------------------------------------

SHORT_DOC_TOKENS = 20


def source_quality_report(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus composition: (source, n_docs, n_langs,
    total_tokens, total_chars, n_short_docs, mean_tokens).

    All counts are exact int64 sums (order-free); ``mean_tokens`` is
    the single division total_tokens / n_docs of identical integers on
    both sides — bit-identical to the oracle per the repo's float
    discipline. Scale shape: per-batch partials grouped on
    (source, lang) — at most sources x langs rows per block — into a
    tiny groupby; the lang-distinct rollup runs driver-side over the
    aggregated sources x langs table only.
    """
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["text", "lang", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok = np.fromiter((t.count(" ") + 1 for t in texts),
                            dtype=np.int64, count=len(texts))
        n_chars = np.fromiter((len(t) for t in texts),
                              dtype=np.int64, count=len(texts))
        df = pd.DataFrame({
            "source": batch["source"].to_pandas(),
            "lang": batch["lang"].to_pandas(),
            "n_docs": np.ones(len(texts), dtype=np.int64),
            "total_tokens": n_tok,
            "total_chars": n_chars,
            "n_short_docs": (n_tok < SHORT_DOC_TOKENS).astype(np.int64)})
        g = df.groupby(["source", "lang"], as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["source", "lang"])
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("total_tokens", alias_name="total_tokens"),
                        Sum("total_chars", alias_name="total_chars"),
                        Sum("n_short_docs", alias_name="n_short_docs"))
             .to_pandas())
    out = (agg.groupby("source", as_index=False)
              .agg(n_docs=("n_docs", "sum"),
                   n_langs=("lang", "nunique"),
                   total_tokens=("total_tokens", "sum"),
                   total_chars=("total_chars", "sum"),
                   n_short_docs=("n_short_docs", "sum")))
    for c in ("n_docs", "n_langs", "total_tokens", "total_chars",
              "n_short_docs"):
        out[c] = out[c].astype(np.int64)
    out["mean_tokens"] = out["total_tokens"] / out["n_docs"].astype(float)
    return (out[["source", "n_docs", "n_langs", "total_tokens",
                 "total_chars", "n_short_docs", "mean_tokens"]]
            .sort_values("source").reset_index(drop=True))


SOURCE_QUALITY_REPORT_SQL = f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(COALESCE(SUM(CASE WHEN len(string_split(text, ' '))
                                   < {SHORT_DOC_TOKENS}
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_short_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
         / CAST(COUNT(*) AS DOUBLE) AS mean_tokens
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# unigram surprisal — the LM-style rarity score, all-integer exact
# ---------------------------------------------------------------------------

def doc_surprisal(sf_dir: str, top_k: int = 20) -> pd.DataFrame:
    """Top-``top_k`` docs by mean token surprisal, where a token's
    surprisal is the INTEGER inverse frequency total_tokens // count —
    the unigram-LM-style rarity signal (CCNet uses a real LM; the
    integer form keeps the two-pass distributed result bit-exact and
    SQL-checkable). Output (doc_id, n_tokens, surprisal_sum) ordered
    by surprisal_sum DESC then doc_id, rank-stable.

    Two passes, the tf-idf discipline: pass 1 reduces each block to
    (token, count) partials — vocab-sized, never corpus-sized — and
    the aggregated vocab broadcasts via closure arrays (sorted token
    hashes + searchsorted, no per-row dict probes); pass 2 is one
    vectorized lookup + per-doc sum, with a per-batch top-k partial so
    only k rows per block reach the final sort."""
    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        toks = []
        for t in batch["text"].to_pylist():
            toks.extend(t.split(" "))
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"token": pa.array(list(u), pa.string()),
                         "cnt": pa.array(c.astype(np.int64))})

    vocab = (ds.map_batches(counts, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
             .to_pandas())
    total = int(vocab["cnt"].sum())
    vocab = vocab.sort_values("token").reset_index(drop=True)
    v_tokens = vocab["token"].to_numpy()
    v_surp = (total // vocab["cnt"].to_numpy(dtype=np.int64))

    def score(batch: pa.Table) -> pa.Table:
        ids, n_out, s_out = [], [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            toks = np.asarray(t.split(" "), dtype=object)
            pos = np.searchsorted(v_tokens, toks)
            ids.append(did)
            n_out.append(len(toks))
            s_out.append(int(v_surp[pos].sum()))
        df = pd.DataFrame({"doc_id": ids, "n_tokens": n_out,
                           "surprisal_sum": s_out})
        df = df.sort_values(["surprisal_sum", "doc_id"],
                            ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (ds.map_batches(score, batch_format="pyarrow").to_pandas()
           .sort_values(["surprisal_sum", "doc_id"],
                        ascending=[False, True])
           .head(top_k).reset_index(drop=True))
    for c in ("doc_id", "n_tokens", "surprisal_sum"):
        out[c] = out[c].astype(np.int64)
    return out


DOC_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
total AS (SELECT SUM(cnt) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM((SELECT n FROM total) // v.cnt) AS BIGINT)
             AS surprisal_sum
  FROM toks t JOIN vocab v ON t.tok = v.tok
  GROUP BY t.doc_id)
SELECT doc_id, n_tokens, surprisal_sum
FROM scored ORDER BY surprisal_sum DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# PII redaction — regex scrubbing with per-pattern accounting
# ---------------------------------------------------------------------------

#: RE2-safe patterns (no backrefs/lookaround): the canonical scrub set
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9\-\s]{7,14}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

#: application order: SPECIFIC before general — the broad phone
#: pattern would otherwise consume SSNs before the ssn pass sees them
PII_ORDER = ("email", "ssn", "phone")


def redact_batch(batch: pa.Table,
                 patterns: dict[str, str] = PII_PATTERNS) -> pa.Table:
    """Vectorized scrub of ``text``: each pattern replaces with
    ``[PII:<name>]`` via one ``pc.replace_substring_regex`` pass (RE2,
    compiled once inside Arrow); emits per-pattern match counts so the
    pipeline can account for what it removed. Application follows
    PII_ORDER (specific before general: the broad phone pattern would
    otherwise consume SSNs first) — deterministic."""
    col = batch["text"]
    counts = {}
    order = [n for n in PII_ORDER if n in patterns] + \
        sorted(set(patterns) - set(PII_ORDER))
    for name in order:
        pat = patterns[name]
        counts[name] = pc.sum(
            pc.count_substring_regex(col, pat)).as_py() or 0
        col = pc.replace_substring_regex(col, pat, f"[PII:{name}]")
    out = batch.set_column(batch.schema.get_field_index("text"),
                           "text", col)
    meta = pa.table({
        "pattern": pa.array(sorted(patterns), pa.string()),
        "n": pa.array([counts[k] for k in sorted(patterns)], pa.int64())})
    return out, meta


def redact_documents_ds(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Lazy redaction of a documents Dataset (text column scrubbed in
    place, one streaming pass)."""
    def apply(b: pa.Table) -> pa.Table:
        out, _ = redact_batch(b)
        return out
    return ds.map_batches(apply, batch_format="pyarrow")


def redaction_counts(ds: "ray.data.Dataset") -> pd.DataFrame:
    """Per-pattern match counts over a documents Dataset — per-batch
    partial rows into a tiny grouped sum (the audit record a PII scrub
    must produce)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _, meta = redact_batch(b)
        return meta

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("pattern").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("pattern").reset_index(drop=True)


# ---------------------------------------------------------------------------
# ngram_lm_novelty — the CCNet/KenLM quality-filter shape at integer
# precision: train an n-gram table on one corpus split, measure how
# much of each held-out doc the model has seen
# ---------------------------------------------------------------------------

def _flat_ngrams(texts: list[str], n: int):
    """(grams, doc_idx) for whole-batch ``n``-gram building: flatten
    tokens, concatenate shifted views with ' ' (tokens cannot contain
    the separator), mask windows straddling doc boundaries."""
    from .corpus import _flatten_tokens

    flat, doc_idx = _flatten_tokens(texts)
    if len(flat) < n:
        return (np.array([], dtype=object),
                np.array([], dtype=np.int64))
    g = flat[:len(flat) - n + 1].copy()
    for j in range(1, n):
        g = g + " "
        g = g + flat[j:len(flat) - n + 1 + j]
    same_doc = doc_idx[:len(flat) - n + 1] == doc_idx[n - 1:]
    return g[same_doc], doc_idx[:len(flat) - n + 1][same_doc]


def ngram_lm_novelty(sf_dir: str) -> pd.DataFrame:
    """Per-language novelty census of held-out documents against a
    bigram table trained on the other corpus split (doc_id % 10 < 8
    trains, >= 8 scores) — the integer-exact skeleton of the
    CCNet/KenLM perplexity filter: instead of a smoothed log-prob it
    reports exactly how many of a doc's bigrams the trained table
    contains. Rows: (lang, n_docs, n_bigrams, n_seen, n_unseen) over
    scored docs with >= 2 tokens.

    Scale shape: pass 1 folds DISTINCT train bigrams per batch before
    a vocabulary-sized shuffle; the table returns to the driver and
    broadcasts once via ``ray.put`` (the boilerplate_ngrams / tf-idf
    discipline); pass 2 scores batches with sorted-array membership
    and emits per-language integer partials. Past broadcastable vocab
    sizes the membership test becomes a hash-partitioned semi-join on
    the bigram string; the two-pass shape is unchanged."""
    import ray

    from ray.data.aggregate import Sum

    ds = _read_docs(sf_dir, columns=["doc_id", "text", "lang"])

    def train_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        texts = batch["text"].to_pylist()
        keep = [t for i, t in zip(ids, texts) if i % 10 < 8]
        grams, _ = _flat_ngrams(keep, 2)
        uniq = np.unique(grams) if len(grams) else grams
        return pa.table({"bg": pa.array(uniq, pa.string())})

    vocab = (ds.map_batches(train_partial, batch_format="pyarrow")
             .groupby("bg").count().to_pandas())
    table = (vocab["bg"].to_numpy(dtype=object) if "bg" in vocab
             else np.array([], dtype=object))
    table.sort()
    bc = ray.put(table)

    def score(batch: pa.Table) -> pa.Table:
        bset = ray.get(bc)
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        texts = batch["text"].to_pylist()
        test = ids % 10 >= 8
        t_texts = [t for t, k in zip(texts, test) if k]
        t_langs = langs[test]
        grams, gdoc = _flat_ngrams(t_texts, 2)
        n_bg = np.bincount(gdoc, minlength=len(t_texts)).astype(np.int64)
        if len(bset) and len(grams):
            pos = np.searchsorted(bset, grams)
            ok = ((pos < len(bset))
                  & (bset[np.minimum(pos, len(bset) - 1)] == grams))
            n_seen = np.bincount(gdoc[ok],
                                 minlength=len(t_texts)).astype(np.int64)
        else:
            n_seen = np.zeros(len(t_texts), dtype=np.int64)
        has = n_bg > 0
        df = pd.DataFrame({"lang": t_langs[has],
                           "n_docs": 1,
                           "n_bigrams": n_bg[has],
                           "n_seen": n_seen[has]})
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(score, batch_format="pyarrow")
           .groupby("lang")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_bigrams", alias_name="n_bigrams"),
                      Sum("n_seen", alias_name="n_seen"))
           .to_pandas())
    for c in ("n_docs", "n_bigrams", "n_seen"):
        out[c] = out[c].astype(np.int64)
    out["n_unseen"] = out["n_bigrams"] - out["n_seen"]
    return out.sort_values("lang").reset_index(drop=True)


NGRAM_LM_NOVELTY_SQL = """
WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS arr
           FROM documents),
nums AS (SELECT unnest(generate_series(1,
           (SELECT MAX(len(arr)) FROM d)::INT)) AS i),
big AS (SELECT doc_id, lang, arr[i] || ' ' || arr[i + 1] AS bg
        FROM d JOIN nums ON i + 1 <= len(arr)),
train AS (SELECT DISTINCT bg FROM big WHERE doc_id % 10 < 8),
scored AS (SELECT b.doc_id, b.lang, t.bg IS NOT NULL AS seen
           FROM (SELECT * FROM big WHERE doc_id % 10 >= 8) b
           LEFT JOIN train t USING (bg))
SELECT lang,
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_bigrams,
       SUM(CASE WHEN seen THEN 1 ELSE 0 END)::BIGINT AS n_seen,
       SUM(CASE WHEN seen THEN 0 ELSE 1 END)::BIGINT AS n_unseen
FROM scored GROUP BY lang ORDER BY lang
"""
