"""Text-analysis operators (SURVEY §2C): tokenization, quality scoring,
language ID, fingerprinting — all as built-in column expressions (JVM-side,
whole-stage-codegen; no Python in the hot path) so they hold up at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# tiny per-language stopword marker lists for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " is "],
    "de": [" der ", " und ", " ist "],
    "fr": [" le ", " et ", " est "],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split, like the oracle's
    string_split — empty fragments preserved by both engines)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# BPE-ish pre-tokenization: letter runs, digit runs, punctuation runs —
# the GPT-2-style split shape, restricted to constructs whose semantics are
# identical in Java regex (Spark) and RE2 (DuckDB oracle)
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens of lowercased text (regexp_extract_all — runs
    JVM-side inside whole-stage codegen)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), F.lit(0))


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


def occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences via the replace-length identity —
    chosen because ``replace`` has identical semantics in Spark and DuckDB,
    so the oracle can mirror it textually."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Stopword-marker score per language over ' '-padded lowercased text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum((occurrences(padded, m) for m in markers), F.lit(0).cast("long"))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language with deterministic tie-break (en > de > fr order),
    'und' when no marker hits at all."""
    s = lang_scores(text)
    return (
        F.when((s["en"] + s["de"] + s["fr"]) == 0, F.lit("und"))
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score(text: Column) -> Column:
    """Cheap quality heuristic: mean of three [0,1] signals — length band,
    alpha ratio, mean-word-length band. Deterministic, engine-portable."""
    n_chars = F.length(text).cast("double")
    alpha_ratio = (
        F.length(F.regexp_replace(text, "[^a-zA-Z ]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1.0))
    )
    n_toks = token_count(text).cast("double")
    mean_word = n_chars / F.greatest(n_toks, F.lit(1.0))
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(0.0)
    word_ok = F.when((mean_word >= 3) & (mean_word <= 12), 1.0).otherwise(0.0)
    return F.round((len_ok + alpha_ratio + word_ok) / F.lit(3.0), 6)


def word_ngrams(tokens: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array, positional order, NOT
    deduped (occurrence-counting ops — PMI, repetition stats — need counts).

    Built by zip_with-ing n shifted slices of the token array rather than
    element_at(tokens, i+j) inside a transform lambda: HOF lambdas are
    interpreted, so an outer expression referenced in the lambda body is
    re-evaluated PER ELEMENT — with tokens = split(text) that recomputed the
    split k times per gram, O(tokens^2) per doc (measured 7.1s -> 0.62s for
    5k docs at sf0.1). zip_with pads the shorter side with null (concat_ws
    drops it), producing short grams at the tail — the final slice to
    len-n+1 elements removes them. Arrays shorter than n yield empty
    (note: Spark's sequence(1, 0) counts *down*, hence the explicit guard).
    """
    sz = F.size(tokens)
    g = tokens
    for j in range(1, n):
        shifted = F.slice(tokens, j + 1, F.greatest(sz - j, F.lit(0)))
        g = F.zip_with(g, shifted, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(sz >= n, F.slice(g, 1, sz - (n - 1))).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (token n-grams) of lowercased text.
    Docs shorter than k tokens yield an empty array."""
    return F.array_distinct(word_ngrams(F.split(F.lower(text), " "), k))


def char_ngrams(text: Column, n: int = 3) -> Column:
    """All character n-grams of lowercased text, in positional order (NOT
    deduped — profile queries want occurrence counts).

    Same construction as ``shingles``: zip_with over n shifted slices of the
    char array, because ``substring(lower(text), i, n)`` inside a transform
    lambda re-evaluates ``lower(text)`` per element (interpreted HOFs),
    turning the expansion O(len^2) per document. Texts shorter than n chars
    yield an empty array.
    """
    cs = F.split(F.lower(text), "")
    sz = F.size(cs)
    g = cs
    for j in range(1, n):
        shifted = F.slice(cs, j + 1, F.greatest(sz - j, F.lit(0)))
        g = F.zip_with(g, shifted, lambda x, y: F.concat(x, y))
    # split('', '') is [''] (size 1!), so the sz guard alone lets an empty
    # text through at n=1 — hence the explicit length gate
    return F.when((F.length(text) > 0) & (sz >= n), F.slice(g, 1, sz - (n - 1))).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized token stream.
    (Content-defined; stable across partitionings — usable as a dedup key.)"""
    return F.xxhash64(F.concat_ws(" ", F.split(F.lower(F.trim(text)), "\\s+")))


# PII detection/redaction: the standard pre-training scrub pass. Patterns
# restricted to constructs whose semantics are identical in Java regex
# (Spark codegen) and RE2 (DuckDB oracle) — no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ccnum": r"\b[0-9]{13,16}\b",
}
# application order matters where categories could overlap (an SSN is not a
# phone, but both are digit runs): scrub specific → general
PII_ORDER = ("email", "ssn", "phone", "ipv4", "ccnum")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts on the ORIGINAL text (counting before
    redaction keeps each category's count independent of scrub order)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_scrub(text: Column) -> Column:
    """Redact every PII category with a typed placeholder (``<EMAIL>`` etc.)
    — a chain of regexp_replace, all in whole-stage codegen; at 100 TB this
    is a pure map stage with zero shuffle."""
    out = text
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def chunk_documents(
    docs,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Sliding-window document CHUNKING — the context-length step between
    curation and training: long documents become overlapping
    ``chunk_tokens``-token windows (stride = chunk_tokens − overlap, so
    consecutive chunks share ``overlap`` tokens of context), short ones
    pass through as a single chunk. The complement of packing (q51/q117
    concatenate SHORT docs up to the budget; this splits LONG ones down
    to it).

    Tail contract (r9, the r8 advisor's finding): a window at start s
    adds unseen tokens iff s < n_tokens − overlap — anything later is
    FULLY CONTAINED in the previous window (e.g. 97 tokens at
    chunk 64/overlap 16: start 96 would emit a 1-token chunk already
    covered by the chunk at 48 — pure duplicate training content for the
    packing step downstream). Such starts are dropped. This loses NOTHING:
    every token still appears in ≥ 1 chunk and every emitted chunk
    contributes ≥ 1 unseen token — which is why it is the default and not
    a knob (a min-tail-length cutoff would instead DROP tail tokens).
    Start 0 always emits, so short docs (n ≤ overlap) still pass through
    as one chunk.

    Fully JVM-side (no UDF): window starts are a filtered sequence,
    windows are array slices, all inside one projection — no shuffle, no
    explode-before-filter blowup; output rows are (id, chunk_idx,
    n_tokens, sig) with sig = md5 of the chunk text, so the DuckDB
    oracle reproduces the REWRITE itself (the q159 discipline). At 100
    TB this is a map-only pass whose output is bounded by
    total_tokens/stride rows."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    # bind the token array and its size to columns FIRST: a HOF lambda
    # referencing split()/size() outer expressions re-evaluates them per
    # element (the q135 trap)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_t"),
        F.size(F.split(F.col(text_col), " ")).alias("_n"),
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0))),
        lambda x: (x % stride == 0)
        & ((x == 0) | (x < F.col("_n") - F.lit(overlap))),
    )
    chunk = F.explode(
        F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("int").alias("chunk_idx"),
                F.slice(F.col("_t"), s + 1, chunk_tokens).alias("_w"),
            ),
        )
    )
    return base.select("doc_id", chunk.alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c._w").cast("long").alias("n_tokens"),
        F.md5(F.array_join(F.col("c._w"), " ")).alias("sig"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical text NORMALIZATION — the cleanup pass real curation
    pipelines (C4, CCNet) run BEFORE any hash-based dedup, because a
    decomposed ``e +  ́`` and a precomposed ``é`` are different bytes with
    identical content and would defeat exact fingerprints. Contract, in
    order:

    1. Unicode NFC composition (canonical, NOT NFKC — compatibility
       folding like ligature expansion is lossy and version-sensitive;
       NFC compositions are stable across Unicode versions);
    2. C0 control runs (``\\x00-\\x1f``, tabs/newlines included) → one
       space;
    3. NBSP (``\\u00a0``) → space;
    4. whitespace runs collapsed to one space, ends trimmed.

    Only step 1 needs Python (Spark SQL has no NFC function) — a minimal
    Arrow-batched UDF doing ``unicodedata.normalize`` and nothing else;
    steps 2–4 are JVM ``regexp_replace``/``trim`` in whole-stage codegen.
    The DuckDB oracle mirrors all four steps exactly
    (``nfc_normalize`` + the same regexes — q166)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(col: pd.Series) -> pd.Series:
        import unicodedata

        return col.map(
            lambda t: None if t is None else unicodedata.normalize("NFC", t)
        )

    out = _nfc(text)
    out = F.regexp_replace(out, r"[\x00-\x1f]+", " ")
    out = F.regexp_replace(out, r"\x{00a0}", " ")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def add_repetition_signals(
    df,
    n: int,
    text_col: str = "text",
    prefix: str | None = None,
):
    """Gopher repetition signals (Rae et al. 2021, Table A1 §"repetitious
    text") — the within-document duplication battery q129's static rules
    deliberately leave out: the character share of the single most frequent
    word n-gram (``top_chars``) and the character share of all n-grams that
    occur more than once (``dup_chars``). Both are emitted as EXACT integer
    numerators (gram length × occurrence count, separator spaces included)
    so threshold checks can run as integer cross-multiplications with zero
    float drift between engines.

    Scale shape: ZERO shuffle and zero Python. The n-grams of one document
    are materialized, sorted, and run-length-encoded entirely inside the
    row's own array columns (``array_sort`` + a filter for run starts + an
    index-aware ``transform`` for run lengths), so per-doc cost is
    O(L·n·log L) inside whole-stage codegen and the whole signal battery
    runs at scan speed on 100 TB — no (doc, gram) exchange, unlike the
    corpus-wide counting ops (q121/q135) this deliberately is not.

    ``top_chars`` is Gopher's actual signal — occurrences × length OF THE
    MOST FREQUENT gram (ties on count broken by the longest gram, so the
    value stays a deterministic scalar) — not a max over count×length,
    which a rarer-but-longer gram could win. Adds two BIGINT columns
    ``{prefix}_top_chars`` / ``{prefix}_dup_chars`` (prefix defaults to
    ``g{n}``); docs shorter than ``n`` tokens get 0s.
    """
    p = prefix or f"g{n}"
    # bind the token array ONCE: HOF lambdas are interpreted, so an outer
    # split() referenced in the lambda body would re-split the text per
    # GRAM — O(tokens²) per doc, the exact q135-documented trap
    df = df.withColumn("_rs_t", F.split(F.col(text_col), " "))
    grams = f"""CASE WHEN size(_rs_t) >= {n}
        THEN array_sort(transform(sequence(0, size(_rs_t) - {n}),
             i -> array_join(slice(_rs_t, i + 1, {n}), ' ')))
        ELSE array() END"""
    df = df.withColumn("_rs_g", F.expr(grams))
    df = df.withColumn(
        "_rs_s",
        F.expr(
            # empty grams need an explicit branch: sequence(0, -1) DESCENDS
            # to [0, -1], and i = -1 would hit element_at's forbidden index 0
            "IF(size(_rs_g) = 0, array(),"
            " filter(sequence(0, size(_rs_g) - 1),"
            "  i -> IF(i = 0, true,"
            "          element_at(_rs_g, i + 1) != element_at(_rs_g, i))))"
        ),
    )
    # one struct per distinct gram: cnt = run length, len = gram chars
    # (run ends at the next start, or the array end)
    df = df.withColumn(
        "_rs_r",
        F.expr(
            """transform(_rs_s, (s, j) -> named_struct(
                 'cnt',
                 CAST((IF(j + 1 < size(_rs_s), element_at(_rs_s, j + 2),
                          size(_rs_g)) - s) AS BIGINT),
                 'len',
                 CAST(length(element_at(_rs_g, s + 1)) AS BIGINT)))"""
        ),
    )
    df = df.withColumn(
        "_rs_tc", F.expr("aggregate(_rs_r, 0L, (a, x) -> greatest(a, x.cnt))")
    )
    df = df.withColumn(
        f"{p}_top_chars",
        F.col("_rs_tc")
        * F.expr(
            "aggregate(_rs_r, 0L,"
            " (a, x) -> IF(x.cnt = _rs_tc, greatest(a, x.len), a))"
        ),
    )
    df = df.withColumn(
        f"{p}_dup_chars",
        F.expr(
            "aggregate(_rs_r, 0L, (a, x) -> a + IF(x.cnt > 1, x.cnt * x.len, 0L))"
        ),
    )
    return df.drop("_rs_t", "_rs_g", "_rs_s", "_rs_r", "_rs_tc")


# the html_to_text regex chain, shared verbatim (modulo engine quoting) with
# the q169 oracle — every construct is in the Java-regex ∩ RE2 intersection:
# NO backreferences (RE2 has none — a single <(script|style)>...</\1> pattern
# silently fails to match there), NO lookaround
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script[ \t\n\f\r]*>", " "),
    (r"(?is)<style\b[^>]*>.*?</style[ \t\n\f\r]*>", " "),
    (r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr)\b[^>]*>", "\n"),  # block ends -> \n
    (r"<[a-zA-Z/!][^>]*>", " "),  # real tags only: 'a < b' survives
    # normalize C0 controls (incl. \x0B/\f/\r) to spaces BEFORE the
    # whitespace steps: Java's \s matches \x0B but RE2's does not, so the
    # later classes must stay explicit — this step makes the only
    # divergent characters disappear on both engines identically
    (r"[\x00-\x08\x0b-\x1f]", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&amp;", "&"),  # LAST: '&amp;lt;' must yield literal '&lt;'
    # after the control step, whitespace is exactly {space, \t, \n} —
    # explicit classes, never \s (Java \s ⊇ RE2 \s)
    (r"[ \t]+", " "),
    (r"[ \t]*\n[ \t]*", "\n"),
    (r"^[ \t\n]+|[ \t\n]+$", ""),
]


def html_to_text(text: Column) -> Column:
    """HTML → text extraction (the CommonCrawl WET-style pass a web corpus
    runs before any text analysis): drop script/style subtrees, turn block
    closers into newlines, strip remaining tags, decode the six common
    entities, normalize whitespace. Pure ``regexp_replace`` chain — JVM
    whole-stage codegen, zero shuffle, scan-speed at 100 TB; the oracle
    (q169) runs the byte-identical chain in DuckDB, which is why every
    pattern avoids backreferences and lookaround (absent from RE2).
    Contract limits (documented, not hidden): entity decoding covers the
    six common names, bare unescaped ``<``/``>`` survive only when not
    followed by a letter (tag-start heuristic), malformed HTML degrades to
    tag-stripping."""
    out = text
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def url_canonicalize(url: Column) -> Column:
    """URL canonicalization (dedup-by-URL prep — the first pass of any
    crawl pipeline): strip fragments, strip ``utm_*`` tracking params
    (promoting the first surviving ``&`` to ``?`` when the removed param
    led the query), lowercase scheme+authority only (paths stay
    case-sensitive), drop scheme-default ports (:80/:443), drop a bare
    root slash. Pure regexp_replace/extract chain — JVM codegen, zero
    shuffle; every pattern is in the Java ∩ RE2 intersection and the
    unmatched-optional-group replacement ('' on both engines) is part of
    the pinned contract (q170's oracle mirrors the chain, group refs
    $N↔\\N being the only textual difference).

    The WHOLE chain is gated on the input matching ``scheme://`` — a
    non-URL string passes through BYTE-VERBATIM ('see #42 & more' keeps
    its fragment-looking tail). utm removal is anchored to the QUERY
    STRING: the post-fragment URL is split at the first ``?`` (RFC 3986's
    query start) and the three separator-aware removal steps (non-leading
    params, leading-followed-by-more, leading-alone) run on the query
    part only, so a literal ``&utm_x=...`` inside a PATH segment is
    preserved byte-verbatim (r10 advisory: the unanchored non-leading
    pattern excised it, silently merging distinct resources). The split
    is ``instr``/``substr`` — same builtins, same codegen class."""
    is_url = url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    u = F.regexp_replace(url, r"#.*$", "")
    qpos = F.instr(u, "?")
    head = F.when(qpos == 0, u).otherwise(u.substr(F.lit(1), qpos - 1))
    query = F.when(qpos == 0, F.lit("")).otherwise(u.substr(qpos, F.length(u)))
    query = F.regexp_replace(query, r"&utm_[a-z]+=[^&#]*", "")
    query = F.regexp_replace(query, r"\?utm_[a-z]+=[^&#]*&", "?")
    query = F.regexp_replace(query, r"\?utm_[a-z]+=[^&#]*$", "")
    u = F.concat(head, query)
    auth = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    prefix = F.regexp_extract(u, auth, 0)
    u = F.concat(F.lower(prefix), u.substr(F.length(prefix) + 1, F.length(u)))
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)/$", "$1")
    return F.when(is_url, u).otherwise(url)
