"""Unicode / multi-byte oracle parity sweep (round-11; encoding twin
of the corrupt-documents gate).

Rounds 8-10's degenerate sweeps probed NULL/empty/boundary SHAPES; the
corpus itself stayed ASCII. Real pretraining corpora are mostly
NON-ASCII, and every text primitive here crosses two engines with
different string libraries (Spark = JVM UTF8String / java.util.regex;
DuckDB = utf8proc / RE2). This file runs EVERY documents-reading
oracle query over a corpus where each row is a known encoding hazard:

- CJK with no spaces (multi-byte, single mega-token)
- precomposed vs decomposed accents (NFC "e\\u0301" vs U+00E9 - must
  be DISTINCT docs: no engine normalizes, and silent normalization
  anywhere would collapse them)
- astral-plane emoji + mathematical alphanumerics (4-byte UTF-8 /
  UTF-16 surrogate pairs - code-point length vs code-unit length
  drift shows up in n_chars-dependent plans)
- Turkish dotted capital I (U+0130) and sharp s - the classic
  simple-vs-full case-mapping divergence. FINDING (round 11): the
  original md5(lower(trim(text))) fingerprint diverged cross-engine
  on exactly this row (JVM full mapping vs utf8proc simple mapping);
  md5_fingerprint now folds ASCII case only (functions/text.py)
- NBSP / zero-width space "word separators" (neither engine's \\s or
  literal-space split treats them as spaces - pinned, not assumed)
- RTL Arabic, combining-heavy Devanagari, a 10k-code-point run of a
  3-byte char

All texts are spelled with explicit escapes so the fixture is
byte-deterministic regardless of editor/terminal normalization. Any
Spark-vs-DuckDB convention drift on these reds this file through the
exact rows+schema+value-hash compare the driver gate applies.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import oracle_queries_reading_only, run_parity_gate

pytestmark = pytest.mark.axis

SF = "/root/testdata/sf0.001"

# Each entry: (slug, text). n_chars is len(text) in Python, i.e.
# Unicode CODE POINTS (matches Spark length() and DuckDB length()).
UNICODE_TEXTS = [
    # Tang poem, no spaces: one 20-code-point / 60-byte "token"
    ("cjk_nospace",
     "\u6625\u7720\u4e0d\u899a\u6681\u51e6\u51e6\u805e\u557c\u9ce5"
     "\u591c\u6765\u98a8\u96e8\u58f0\u82b1\u843d\u77e5\u591a\u5c11"),
    ("cjk_spaced",
     "\u6625\u7720 \u4e0d\u899a \u6681 \u51e6\u51e6 \u805e "
     "\u557c\u9ce5 \u591c\u6765 \u98a8\u96e8 \u58f0"),
    # precomposed U+00E9 everywhere
    ("nfc_accent",
     "caf\u00e9 au lait caf\u00e9 cr\u00e8me"),
    # same visible word, decomposed e + COMBINING ACUTE (U+0301)
    ("nfd_accent",
     "cafe\u0301 au lait cafe\u0301 cre\u0300me"),
    # 4-byte UTF-8: rocket emoji + mathematical fraktur letters
    ("emoji_astral",
     "rocket \U0001f680 launch \U0001f680\U0001f60a done "
     "\U0001d504\U0001d505"),
    # U+0130: JVM full lowercase -> "i" + U+0307 (2 cp); utf8proc
    # simple lowercase -> "i" (1 cp)
    ("turkish_dotted_I",
     "\u0130stanbul \u0130STANBUL istanbul"),
    # U+00DF sharp s (lowercase already; uppercasing is the hazard)
    ("sharp_s",
     "stra\u00dfe STRASSE stra\u00dfe gro\u00df"),
    # U+FB03 ffi / U+FB01 fi ligatures (compatibility chars)
    ("ligature_fi",
     "e\ufb03cient \ufb01le e\ufb03cient"),
    # words "separated" by U+00A0 NBSP - not a \\s match in Java or RE2
    ("nbsp_words",
     "alpha\u00a0beta\u00a0gamma delta"),
    # U+200B zero-width space between words
    ("zwsp_words",
     "alpha\u200bbeta\u200bgamma delta"),
    ("rtl_arabic",
     "\u0645\u0631\u062d\u0628\u0627 "
     "\u0628\u0627\u0644\u0639\u0627\u0644\u0645 "
     "\u0645\u0631\u062d\u0628\u0627"),
    # Devanagari with combining vowel signs / virama
    ("devanagari_combining",
     "\u0928\u092e\u0938\u094d\u0924\u0947 "
     "\u0926\u0941\u0928\u093f\u092f\u093e "
     "\u0928\u092e\u0938\u094d\u0924\u0947"),
    ("mixed_scripts",
     "hello \u4e16\u754c world \u043c\u0438\u0440 bonjour"),
    # 10k code points of a 3-byte char: byte-length 30k vs char 10k -
    # any byte-indexed substring/window drifts loudly here
    ("long_3byte_run", "\u3042" * 10_000),
    # tab/newline INSIDE text (regex \\s+ tokenizer vs literal-space)
    ("embedded_controls", "first\tsecond\nthird fourth"),
    # U+FEFF (BOM / zero-width no-break space) leading and mid-word
    ("bom_in_text",
     "\ufeffstart mid\ufeffdle end"),
    # LEADING/TRAILING unicode whitespace (round-11 property finding:
    # DuckDB's bare trim strips NBSP/U+3000 where Spark's trim strips
    # U+0020 only - every oracle now spells trim(text, ' ') and these
    # rows keep that honest through every documents query)
    ("lead_trail_nbsp", "\u00a0padded words\u00a0"),
    ("lead_ideographic_space", "\u3000wide lead\u3000"),
    ("lead_tab_trail_newline", "\tleading tab trailing\n"),
]


@pytest.fixture(scope="module")
def unicode_docs_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet")
    rows = src.slice(0, 30).to_pylist()
    nxt = max(r["doc_id"] for r in rows) + 1
    for j, (slug, text) in enumerate(UNICODE_TEXTS):
        rows.append(
            dict(doc_id=nxt + j, text=text, lang="xx", source=f"u_{slug}",
                 n_chars=len(text))
        )
    # an exact duplicate of the NFC row under a new id: exact-dedup
    # must collapse THIS pair while keeping NFC vs NFD distinct
    rows.append(
        dict(doc_id=nxt + len(UNICODE_TEXTS),
             text=UNICODE_TEXTS[2][1], lang="xx", source="u_nfc_dup",
             n_chars=len(UNICODE_TEXTS[2][1]))
    )
    sf = tmp_path_factory.mktemp("unicode_docs_sf")
    pq.write_table(
        pa.Table.from_pylist(rows, schema=src.schema),
        str(sf / "documents.parquet"),
    )
    return str(sf)


def test_every_documents_oracle_agrees_on_unicode_corpus(
    spark, unicode_docs_sf
):
    names = oracle_queries_reading_only({"documents"})
    assert len(names) >= 30, f"query discovery collapsed: {names}"
    # media_frame_sample's oracle slices VARCHAR because DuckDB 1.x has
    # no BLOB substring/sha256; its registry doc DECLARES that the
    # oracle equals byte slicing only on pure-ASCII corpora and that a
    # non-ASCII doc must fail its parity check loudly. This corpus is
    # that declared tripwire firing, not drift: byte semantics on
    # multi-byte payloads are pinned Spark-side in test_multimodal.
    names = [n for n in names if n != "media_frame_sample"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{unicode_docs_sf}/documents.parquet'"
    )
    try:
        fails = run_parity_gate(spark, con, names, unicode_docs_sf)
        assert not fails, "unicode oracle drift:\n" + "\n".join(
            f"  {n}: {m}" for n, m in fails
        )
    finally:
        con.close()
