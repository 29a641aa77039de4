"""Text primitives for the document-processing operators.

All built-in expressions (split/transform/sequence/hash) - no UDFs, so
they vectorize inside codegen and scale linearly with input bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Single-space split keeps cross-engine
    parity trivial; use ``tokens_re`` for real-world whitespace."""
    return F.split(F.trim(text), " ")


def tokens_re(text: Column) -> Column:
    """Regex whitespace tokenization (runs of any whitespace)."""
    return F.split(F.trim(text), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def word_ngrams_of(toks: Column, n: int) -> Column:
    """Word n-grams (shingles) over a PRE-MATERIALIZED token array.

    ``toks`` must be a column materialized at a projection boundary
    (``select(split(...).alias(...))``), never the split expression
    itself: the per-position lambda references ``toks`` once per
    shingle, and an unmaterialized expression there re-evaluates the
    whole split per position - O(len^2) per row (the doc_winnowing
    lesson; measured 2.7x on 8-gram shingling at sf0.1). For texts
    shorter than n tokens the result is an empty array.
    """
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams straight from a text column. Convenience/compat
    wrapper: the split lands inside the shingling lambda, so per-row
    cost is quadratic in token count - fine for one-off expressions,
    but hot paths should stage ``tokens(text)`` at a projection
    boundary and call ``word_ngrams_of`` (see its docstring)."""
    return word_ngrams_of(tokens(text), n)


# ASCII-only BPE-ish pre-tokenization classes: letter runs, digit runs,
# single non-alnum marks. ASCII-only on purpose: Java regex (Spark) and
# RE2 (DuckDB) agree exactly on these classes, so the same pattern string
# is the oracle's pattern.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_bpe(text: Column) -> Column:
    """BPE-style pre-tokenization (letter runs / digit runs / punctuation
    marks) - the subword-budget counter for training-data pipelines.
    Whitespace never tokenizes; 'don't' -> [don, ', t]."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def kgram_hashes(text: Column, k: int = 3) -> Column:
    """md5 hex hash per word k-gram - the winnowing input. md5 (not
    xxhash64) because it is the one hash DuckDB shares, keeping the
    fingerprints oracle-checkable.

    MUST be materialized as its own projection (``.select(...alias())``)
    before ``winnow_minima`` consumes it: inlining this expression into
    the per-window lambda would recompute every gram hash once per
    window - O(grams x windows) per document instead of O(grams).
    """
    return F.transform(word_ngrams(text, k), lambda g: F.md5(g))


def kgram_hashes_of(toks: Column, k: int = 3) -> Column:
    """``kgram_hashes`` over a pre-materialized token array - same
    staging rule as ``word_ngrams_of``: with the split landed at a
    projection boundary, gram construction is O(grams) per row instead
    of re-splitting the text once per gram position."""
    return F.transform(word_ngrams_of(toks, k), lambda g: F.md5(g))


def winnow_minima(hashes: Column, window: int = 4) -> Column:
    """Winnowing selection (Schleimer/Wilkerson/Aiken's MOSS algorithm)
    over an already-materialized hash array COLUMN: slide a window of
    ``window`` hashes, keep each window's lexicographic minimum, dedup,
    sort. Robust to insertions - local edits disturb only nearby
    windows, unlike a whole-doc hash. Returns sorted ``array<string>``.
    """
    n_windows = F.size(hashes) - (window - 1)
    mins = F.when(F.size(hashes) < window, F.array_distinct(hashes)).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_windows),
                lambda i: F.array_min(F.slice(hashes, i, window)),
            )
        )
    )
    return F.array_sort(mins)


#: ASCII case-fold pair for fingerprinting. Full Unicode lower() is
#: LIBRARY-dependent - the JVM applies the full mapping (U+0130 ->
#: "i"+U+0307, 2 code points) while utf8proc/DuckDB applies the simple
#: mapping (U+0130 -> "i") - so a fingerprint built on lower() is not
#: reproducible across engines or engine upgrades. Same call ClickHouse
#: makes: lower() folds ASCII only; full folding is an explicit opt-in
#: normalization pass, never baked into an identity key.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def md5_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized
    (trimmed, ASCII-case-folded) text - the exact-dedup key.

    Case normalization is deliberately ASCII-only (``translate``, not
    ``lower``): see ``_ASCII_UPPER``. Non-ASCII case variants ("МИР" vs
    "мир") are treated as distinct documents - deterministically, in
    every engine; the round-11 unicode parity sweep
    (tests/test_unicode_documents_parity.py) pins this cross-engine.
    """
    return F.md5(F.translate(F.trim(text), _ASCII_UPPER, _ASCII_LOWER))


def shingle_hashes(shingles: Column) -> Column:
    """One xxhash64 pass over the shingle strings -> ``array<bigint>``.

    MUST be materialized as its own projection (``.select(...alias())``)
    before ``minhash_signature`` consumes it - same CollapseProject
    hazard as ``kgram_hashes``: inlined, the string-hash pass would be
    recomputed once per hash family (64x the string hashing).
    """
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_signature(hashed_shingles: Column, num_hashes: int) -> Column:
    """MinHash signature over PRE-HASHED shingles (``shingle_hashes``):
    for seed i, min over shingles of xxhash64(i, h). Salting via a
    literal first argument gives ``num_hashes`` independent hash
    families from one built-in hash fn; rehashing the 8-byte precomputed
    hash instead of the shingle string keeps the per-family pass
    fixed-width (the strings are hashed exactly once, not once per
    family). Returns ``array<bigint>`` of length ``num_hashes``."""
    return F.array(
        *[
            F.array_min(
                F.transform(hashed_shingles, lambda h, i=i: F.xxhash64(F.lit(i), h))
            )
            for i in range(num_hashes)
        ]
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# Pattern scrubbing / PII redaction
# ---------------------------------------------------------------------------

# Default PII patterns, written in the Java-regex/RE2 common subset
# (character classes, bounded repetition, \b word boundaries - no
# lookaround) so the SAME pattern string drives Spark, the DuckDB
# oracle, and any downstream engine.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "[EMAIL]"),
    "phone": (r"\+?[0-9][0-9()\-. ]{6,}[0-9]\b", "[PHONE]"),
    "url": (r"https?://[^\s]+", "[URL]"),
}


def match_count(text: Column, pattern: str) -> Column:
    """Non-overlapping match count of ``pattern`` (BIGINT). Pure
    expression (regexp_count), JVM-side; DuckDB mirror is
    ``len(regexp_extract_all(text, pattern))``."""
    return F.regexp_count(text, F.lit(pattern)).cast("long")


def scrub(text: Column, patterns: dict[str, tuple[str, str]]) -> Column:
    """Replace every match of every pattern with its replacement token,
    applied in dict order (order matters when patterns overlap - e.g.
    scrub emails before bare domains). One chained regexp_replace
    pipeline: per-row map work, no shuffle, linear in input bytes at
    any scale."""
    out = text
    for regex, replacement in patterns.values():
        out = F.regexp_replace(out, regex, replacement)
    return out


def redact_pii(text: Column) -> Column:
    """Scrub the default email/phone/url PII classes."""
    return scrub(text, PII_PATTERNS)


# --- md5-exact MinHash family (cross-engine-reproducible) -----------------
#
# Base hash: the signed-BIGINT-safe md5 prefix (same trick as
# kmv_hash/cms_sketch) reduced mod the Mersenne prime P = 2^31 - 1;
# family i is the affine map (a_i * h + b_i) mod P. With h < P < 2^31
# and a_i < P the product stays under 2^62 - no overflow in either
# engine, so every signature value is an integer DuckDB computes
# identically, which is what upgrades the MinHash pipeline from
# rows-only to value-hash oracle-checkable. The xxhash64 family
# (shingle_hashes/minhash_signature) remains the JVM fast path.
MINHASH_P = 2_147_483_647


def minhash_family_params(i: int) -> tuple[int, int]:
    """Deterministic affine-family constants (a_i, b_i), a_i != 0.
    Pure integer arithmetic on literals - the oracle SQL embeds the
    same numbers via this function, so the two engines cannot drift."""
    a = ((i + 1) * 2_654_435_761) % MINHASH_P or 1
    b = ((i + 1) * 40_503 + 7_919) % MINHASH_P
    return a, b


def shingle_hashes_md5(shingles: Column) -> Column:
    """md5-prefix shingle hashes reduced mod MINHASH_P -> array<bigint>.
    Same materialize-before-use contract as ``shingle_hashes``."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % MINHASH_P,
    )


def fused_shingle_hashes_md5(toks: Column, n: int) -> Column:
    """md5-prefix shingle hashes computed STRAIGHT from the token array:
    the shingle string exists only as a per-element temporary inside the
    transform, never materialized as an ``array<string>`` column between
    projections (round-15: the shingle-array materialization was the
    dominant cost of the minhash pipeline's tokenize floor). The md5
    INPUT is byte-identical to ``word_ngrams_of`` by construction - the
    SAME ``array_join(slice(toks, i, n), " ")`` expression - so every
    downstream signature/band/verify value is unchanged (oracle-pinned).

    ``toks`` must be materialized at a projection boundary (the
    ``word_ngrams_of`` O(len^2) hazard), and callers must pre-filter
    ``size(toks) >= n`` - this fused form has no empty-array branch.
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(toks, i, n), " ")), 1, 15),
            16,
            10,
        ).cast("long")
        % MINHASH_P,
    )


def fused_shingle_hashes_xx(toks: Column, n: int) -> Column:
    """xxhash64 twin of ``fused_shingle_hashes_md5`` (same fusion, same
    caller contract, the operator-default hash family)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i, n), " ")),
    )


def minhash_signature_md5(hashed_shingles: Column, num_hashes: int) -> Column:
    """MinHash signature over md5-prefix hashes: min over shingles of
    the affine family maps. Cheaper per family than the xxhash64 path
    (two multiplies and a mod vs a full hash) - the md5 cost moved to
    the one-time base-hash pass."""
    # one-arg closure per family: a two-arg lambda would make transform
    # bind Spark's array INDEX to the second parameter
    def _family(i: int):
        a, b = minhash_family_params(i)
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(hashed_shingles, _family(i)))
            for i in range(num_hashes)
        ]
    )


_NFC_UDF = None


def nfc_normalize(text: Column) -> Column:
    """Unicode NFC normalization - the explicit opt-in pass the
    fingerprint docstring points to: ``md5_fingerprint`` deliberately
    does NOT normalize (an identity key must be cheap and
    engine-stable), so corpora where composed and decomposed spellings
    of the same word should deduplicate together run this pass first.

    NFC has no JVM built-in in Spark SQL, so this is the one place the
    text family uses Python - as an Arrow-batched pandas UDF (never
    row-at-a-time), applying ``unicodedata.normalize("NFC", ...)``.
    Cross-engine safe: DuckDB's ``nfc_normalize`` implements the same
    Unicode normalization form and matches bit-for-bit (verified on
    decomposed accents, combining dakuten, ligatures, astral plane -
    round-11 unicode sweep; property-tested over arbitrary unicode in
    tests/test_unicode_properties.py). One known DuckDB-side quirk,
    pinned there: DuckDB nfc_normalize C-string-truncates some
    NUL-bearing inputs (``'\\x00\\x80'`` -> ``''``) where this UDF and
    the JVM preserve NUL - NUL-bearing text is the one shape the
    dedup_exact_nfc ORACLE cannot check (the engine side is fine).
    The UDF is built lazily and cached: creating a pandas UDF needs no
    session, but deferring keeps import light."""
    global _NFC_UDF
    if _NFC_UDF is None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        def _nfc(s):
            import unicodedata

            return s.map(
                lambda v: v if v is None else unicodedata.normalize("NFC", v)
            )

        # real (non-string) annotations: this module's `from __future__
        # import annotations` would stringify inline hints, which
        # pandas_udf cannot resolve for a locally-imported pd
        _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
        _NFC_UDF = pandas_udf(_nfc, "string")
    return _NFC_UDF(text)
