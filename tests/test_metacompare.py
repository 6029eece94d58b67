"""Metadata-comparison kernel tests (A9, C12-C17)."""

from __future__ import annotations

from pdf_extract_spark.operators import metacompare as MC


def test_extract_punct():
    # faithful order: end_periods FIRST, then the class matches
    # (metadata_generator.py:92-96)
    assert MC.extract_punct("What? Yes: ok; 50% done.") == [".", "?", ":", ";", "%"]
    assert MC.extract_punct("no punct here") == []
    # the \.$ check runs on the RAW text: a trailing space blocks it,
    # but Python's $ matches before ONE final newline
    assert MC.extract_punct("done. ") == []
    assert MC.extract_punct("done.\n") == ["."]
    assert MC.extract_punct("done.\n\n") == []
    assert MC.extract_punct("") == []


def test_punct_status_order_sensitive():
    """punct_match_type is binary and ORDER-sensitive — same multiset in
    a different order is no_match (compare_punctuation compares lists)."""
    assert MC.punct_status("a? b!", "c? d!") == "match"
    assert MC.punct_status("a? b!", "c! d?") == "no_match"
    assert MC.punct_status("plain", "plain") == "match"  # [] == []
    assert MC.punct_status("done.", "done") == "no_match"


def test_extract_numbers_cascade_order():
    # thousands-sep captured whole, not re-matched by bare-int; commas
    # strip at append time (reference: m.group(0).replace(',',''))
    assert MC.extract_numbers("costs 1,234.5 total") == ["1234.5"]
    assert MC.extract_numbers("3.5 and 2-4 and 1st and 7") == ["3.5", "2-4", "1st", "7"]
    # tokens come out PATTERN-major (all decimals before all bare ints),
    # not text-position order — reference appends per pattern pass
    assert MC.extract_numbers("7 then 3.5") == ["3.5", "7"]
    # masking: '12' inside '12.5' must not double-count
    assert MC.extract_numbers("12.5") == ["12.5"]
    # superscripts: only the ENGLISH extractor sees them, one digit per
    # DISTINCT superscript char, prepended (metadata_generator.py:155)
    assert MC.extract_numbers("area m²") == []
    assert MC.extract_numbers_en("area m²") == ["2"]
    assert MC.extract_numbers_en("x² and y² is 7") == ["2", "7"]
    # ordinal tokens keep their suffix; \b blocks mid-word ordinals
    assert MC.extract_numbers_en("the 2ND item") == ["2ND"]
    assert MC.extract_numbers_en("ax2nd") == ["2"]


def test_map_number_words():
    """Expectations derived from the reference's matching rules
    (metadata_generator.py:180-203): exact hit first, hyphen token maps
    its FIRST prefix-matching part then stops, bare tokens prefix-match
    the map in insertion order."""
    assert MC.map_number_words("one dozen eggs") == ["1", "12"]
    assert MC.map_number_words("twenty-one") == ["20"]  # first part wins, break
    assert MC.map_number_words("the third of Jan.") == ["3", "1"]
    assert MC.map_number_words("double-hull tanker") == ["2"]
    assert MC.map_number_words("a dual redundant design") == ["2"]
    assert MC.map_number_words("the hexagonal bolt") == ["6"]  # hexa prefix
    assert MC.map_number_words("quarterly report") == ["4"]    # quarter prefix
    assert MC.map_number_words("thousands of pages") == ["1000"]


def test_counter_multiset_semantics():
    # array_intersect would dedup; Counter keeps multiplicity
    assert MC.counter_diff(["a", "a", "b"], ["a", "b", "b"]) == (2, 1, 1)
    assert MC.counter_diff([], ["x"]) == (0, 0, 1)


def test_number_status():
    """Expectations derived from IntegratedNumberComparer.compare
    (metadata_generator.py:222-271) — two-stage: digits first, word maps
    only when digits alone are not no_numbers/all_match."""
    # digits agree -> all_match WITHOUT consulting the word maps ('pair'
    # on the en side must NOT inflate the en multiset)
    assert MC.number_status("2개", "a pair of 2") == "all_match"
    # kr has digits, en has none -> en side gets the English word map
    assert MC.number_status("5개", "five items") == "all_match"
    assert MC.number_status("2개", "a pair of items") == "all_match"
    assert MC.number_status("7개", "three items") == "no_match"
    assert MC.number_status("항목", "items") == "no_numbers"
    assert MC.number_status("1과 2", "1 and 5") == "partial_match"
    # the reference's ordinal token keeps its suffix: kr '2번째' yields
    # '2' but en '2nd' yields '2nd' -> they do NOT match
    assert MC.number_status("3개의 항목 중 2번째", "the 2nd of 3 items") == "partial_match"


def test_pair_class():
    """Faithful check_only_eng_korean_sentence semantics
    (metadata_generator.py:383-421): the class detects rows whose
    'Korean' cell actually holds the English sentence."""
    assert MC.pair_class(None, "x") == "invalid_input"
    assert MC.pair_class("", "  ") == "empty"  # BOTH sides empty
    # one empty side is NOT 'empty': falls through to the hangul check
    assert MC.pair_class(" ", "x") == "no_korean_in_kor"
    assert MC.pair_class("no korean", "none") == "no_korean_in_kor"
    # the kr cell holds the en sentence -> all_match (case-insensitive)
    assert MC.pair_class("GOOD.", "good.") == "all_match"
    # equal only after whitespace removal -> partial_match
    assert MC.pair_class("Good one.", "Goodone.") == "partial_match"
    # equality is checked BEFORE the hangul test (reference order)
    assert MC.pair_class("abc", "abc") == "all_match"
    # a real translation pair is just a valid candidate
    assert MC.pair_class("좋다.", "Good.") == "valid_candidate"
    assert MC.pair_class("좋다!", "Good?") == "valid_candidate"


def test_symbols_superscript_equivalence():
    assert MC.extract_symbols("m² × 3") == ["×"]  # ² normalizes to digit 2


def test_spark_pair_metadata(spark):
    rows = [
        {"kr_text": "토지 면적은 1,234.5 m²이다.", "en_text": "The land area is 1,234.5 m²."},
        {"kr_text": "두 번째 항목?", "en_text": "the second item?"},
        {"kr_text": "plain english", "en_text": "plain english"},
    ]
    df = spark.createDataFrame(rows)
    got = [r["meta"].asDict() for r in MC.pair_metadata(df).collect()]
    exp = [MC.compare_pair(r["kr_text"], r["en_text"]) for r in rows]
    for g, e in zip(got, exp):
        assert g == e
    # kr extractor ignores the superscript ² but the en extractor emits
    # a '2' for it -> digit multisets differ on the shared '1234.5',
    # word maps add nothing => partial_match (reference semantics)
    assert got[0]["number_status"] == "partial_match"
    # identical kr and en text = the 'English sentence in the Korean
    # cell' case the reference class exists to catch
    assert got[2]["pair_class"] == "all_match"
    assert got[1]["pair_class"] == "valid_candidate"


def test_word_status_variants():
    """Faithful compare_english_words semantics (metadata_generator.py:
    283-341): EN-side-only variant expansion, Counter multiplicity,
    distinct-word verdict."""
    # en 'tanks' credits 'tank' (en-side de-pluralization)...
    assert MC.word_status("tank 점검", "inspect the tanks") == "all_match"
    # ...but the direction does NOT reverse: kr plural vs en singular
    assert MC.word_status("tanks 점검", "inspect the tank") == "no_match"
    # kr hyphen tokens are one word; en-side hyphen splitting credits
    # parts, so a kr joined token needs the same joined token in en
    assert MC.word_status("ballast-water 처리", "treat ballast-water") == "all_match"
    assert MC.word_status("ballast-water 처리", "treat ballast water") == "no_match"
    # dotted words are single tokens
    assert MC.word_status("Ph.D 과정", "the Ph.D program") == "all_match"
    # roman numeral satisfied by its digit in the raw en text
    assert MC.word_status("제 iii 장", "chapter 3") == "all_match"
    # digit-suffix tokens join the en counter ('1st' -> 'st')
    assert MC.word_status("st 규격", "the 1st standard") == "all_match"
    # multiplicity: kr needs TWO 'imo', en supplies one -> that word is
    # missing -> all distinct kr words missing -> no_match
    assert MC.word_status("IMO 및 IMO", "per IMO") == "no_match"
    # distinct-word verdict: one of two covered -> partial
    assert MC.word_status("SOLAS 및 MARPOL", "per SOLAS only") == "partial_match"
    assert MC.word_status("ABC 항목", "nothing relevant") == "no_match"
    assert MC.word_status("한국어만", "english only") == "no_eng_in_kor"


def test_symbol_status_reference_semantics():
    """Faithful compare_special_symbols (metadata_generator.py:354-372):
    NFKC first, wide allowlist, leftover symbols redeemed against the
    other side's digits."""
    # ASCII punct / parens / curly quotes are ALLOWED chars, not symbols
    assert MC.symbol_status("좋다! (주)", "good? “ok”") == "no_special_symbols"
    # matching symbols cancel
    assert MC.symbol_status("온도 30℃", "at 30℃") == "all_match"
    # NFKC collapses ℃ -> °C: the ° symbol remains on the kr side only
    assert MC.symbol_status("온도 30℃", "at 30 degrees") == "no_match"
    # superscript digits NFKC into digits and redeem against digits
    assert MC.symbol_status("면적 m²", "area of m2") == "no_special_symbols"
    # partial: one of two symbol occurrences cancels
    assert MC.symbol_status("× 그리고 †", "× only") == "partial_match"


def test_month_prefix_abbreviations():
    # month abbreviations and their extensions prefix-match through the
    # reference's startswith scan (tokenization strips the dots)
    assert MC.map_number_words("due Janu. next") == ["1"]
    assert MC.map_number_words("Sept. meeting") == ["9"]
    # documented reference quirk: 'mayor' startswith 'may' -> '5'
    assert MC.map_number_words("the mayor spoke") == ["5"]


def test_korean_number_words():
    """C14 kr side (metadata_generator.py:132-140): 이중/더블 -> '2',
    findall semantics (multiplicity, prefix hits inside compounds)."""
    from pdf_extract_spark.operators.metacompare import map_korean_number_words

    assert map_korean_number_words("이중 배관") == ["2"]
    assert map_korean_number_words("더블 체크 후 이중 잠금") == ["2", "2"]
    assert map_korean_number_words("이중화된 시스템") == ["2"]  # compound prefix
    assert map_korean_number_words("배관 점검") == []
    assert map_korean_number_words("") == []


def test_number_status_korean_words_pair_with_english():
    """The Korean word map fires only in the reference's stage 2, and
    only on the side(s) the reference extends: with NO digits anywhere
    the maps are never consulted (no_numbers), and when only the en side
    has digits the KR side gets the 이중/더블 map."""
    from pdf_extract_spark.operators.metacompare import number_status

    # no digits on either side -> word maps never consulted
    assert number_status("이중 격벽 구조", "double hull structure") == "no_numbers"
    assert number_status("이중 격벽", "single hull") == "no_numbers"
    assert number_status("격벽 구조", "hull structure") == "no_numbers"
    # en digits, kr none -> kr side extends with the Korean map
    assert number_status("이중 격벽", "2 hulls") == "all_match"
    assert number_status("더블 체크", "checked 3 times") == "no_match"
    # kr digits, en none -> ONLY the en side extends (kr keeps just its
    # digit '3'; en maps double->2, three->3 -> multisets {3} vs {2,3})
    assert number_status("이중 격벽과 3개의 탱크", "double hull and three tanks") == "partial_match"
    # both sides have digits but disagree -> both sides extend (kr's
    # 이중 supplies the '2' that matches the en side's literal 2)
    assert number_status("이중 격벽 3개", "2 or 3 hulls") == "all_match"
    # ...but matching digits skip mapping entirely
    assert number_status("이중 격벽 1개", "1 double hull") == "all_match"


def test_pair_stats_reference_edge_semantics(spark):
    """Python str.split() word counts (edge whitespace never inflates;
    whitespace-only counts 0), NULL text behaves like fillna(''), and a
    NULL match_type passes the matched test (pandas NaN != 'unmatched'
    is True) so potential_split is never NULL."""
    rows = [
        (1, "hello world\n", "a b", "aligned"),
        (2, "\t", None, None),
        (3, " one two three four five six ", "x", "aligned"),
        (4, "one two three four five six", "x", "unmatched"),
        # Unicode whitespace: ideographic space U+3000 between Korean
        # words, NBSP-joined en words, NEL/U+2009 edge trim — Python's
        # str.split() splits/trims ALL of these (Java/RE2 \s would not)
        (5, "한국　단어　셋", "a b", "aligned"),
        (6, " x y", "　", "aligned"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, kr_text string, en_text string, match_type string"
    )
    out = {r["doc_id"]: r for r in MC.pair_stats(df).collect()}
    assert out[1]["word_count_kr"] == 2          # trailing newline ignored
    assert out[2]["word_count_kr"] == 0          # whitespace-only -> 0
    assert out[2]["word_count_en"] == 0 and out[2]["chr_len_en"] == 0  # NULL -> ''
    assert out[2]["potential_split"] is False    # never NULL
    assert out[3]["word_count_kr"] == 6
    assert out[3]["potential_split"] is True     # long kr, short en, matched
    assert out[4]["potential_split"] is False    # unmatched blocks the flag
    # Python semantics on the Unicode whitespace rows
    assert out[5]["word_count_kr"] == len("한국　단어　셋".split()) == 3
    assert out[6]["word_count_kr"] == 2 and out[6]["word_count_en"] == 0

    # the DuckDB mirror must agree char-for-char on the same rows
    import duckdb

    vals = ", ".join(
        "(%d, %s, %s, %s)"
        % (i, *("NULL" if v is None else "'%s'" % v for v in (k, e, m)))
        for i, k, e, m in rows
    )
    cte = ("prs AS (SELECT * FROM (VALUES " + vals
           + ") t(doc_id, kr_text, en_text, match_type))")
    ddb = duckdb.sql(MC.pair_stats_sql(cte)).df().set_index("doc_id")
    for i, _, _, _ in rows:
        assert int(ddb.loc[i, "word_count_kr"]) == out[i]["word_count_kr"]
        assert int(ddb.loc[i, "word_count_en"]) == out[i]["word_count_en"]
        assert bool(ddb.loc[i, "potential_split"]) == out[i]["potential_split"]


def test_content_filter_kernels():
    """F7/F8 pure kernels against reference-derived truths
    (metadata_generator.py:430-463)."""
    assert MC.is_numbers_only("1,234.5 67") is True
    assert MC.is_numbers_only("7") is True
    assert MC.is_numbers_only("   ") is False      # blank -> False
    assert MC.is_numbers_only("x1") is False
    assert MC.is_numbers_only(" nan. ") is False

    assert MC.is_symbols_or_single_alphabet_only("x") is True    # lone letter
    assert MC.is_symbols_or_single_alphabet_only("×") is True    # lone symbol
    assert MC.is_symbols_or_single_alphabet_only(" nan. ") is True  # -> '.'
    assert MC.is_symbols_or_single_alphabet_only("7") is False   # digit survives
    assert MC.is_symbols_or_single_alphabet_only("가") is False  # hangul survives
    assert MC.is_symbols_or_single_alphabet_only("xy") is False
    assert MC.is_symbols_or_single_alphabet_only(None) is False


def test_content_filters_query_matches_kernels(spark):
    """The Catalyst twin in the content_filters query must agree with the
    pure Python kernels row by row."""
    from pdf_extract_spark.queries import _CF_DECOS, QUERIES

    out = {r["doc_id"]: r for r in
           QUERIES["content_filters"](spark, "/root/testdata/sf0.001").collect()}
    import duckdb

    texts = duckdb.sql(
        "SELECT doc_id, text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).df().set_index("doc_id")["text"].to_dict()
    for doc_id, row in out.items():
        t = _CF_DECOS[doc_id % 8]
        if t is None:
            t = texts[doc_id]
        assert row["numbers_only"] == MC.is_numbers_only(t), (doc_id, t)
        assert row["single_noise"] == MC.is_symbols_or_single_alphabet_only(t), (doc_id, t)


def test_pair_status_fixture_triples_match_kernel():
    """Guards the pair_status_counts oracle: its SQL inlines the
    per-class (number_status, word_status, pair_class) triples as pinned
    golden data — recompute every one through the real cascade kernel so
    a kernel change fails HERE before the driver oracle could drift."""
    from pdf_extract_spark.queries import _PAIR_STATUS_FIXTURE

    for i, (kr, en, num, word, cls) in enumerate(_PAIR_STATUS_FIXTURE):
        m = MC.compare_pair(kr, en)
        got = (m["number_status"], m["word_status"], m["pair_class"])
        assert got == (num, word, cls), f"class {i}: {got}"
