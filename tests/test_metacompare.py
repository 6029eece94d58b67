"""Metadata-comparison kernel tests (A9, C12-C17)."""

from __future__ import annotations

from pdf_extract_spark.operators import metacompare as MC


def test_extract_punct():
    assert MC.extract_punct("What? Yes: ok; 50% done.") == ["?", ":", ";", "%", "."]
    assert MC.extract_punct("no punct here") == []


def test_extract_numbers_cascade_order():
    # thousands-sep captured whole, not re-matched by bare-int
    assert MC.extract_numbers("costs 1,234.5 total") == ["1,234.5"]
    assert MC.extract_numbers("3.5 and 2-4 and 1st and 7") == ["3.5", "2-4", "1st", "7"]
    # superscript digits normalize before matching (en side, :143-159)
    assert MC.extract_numbers("area m²") == ["2"]
    # masking: '12' inside '12.5' must not double-count
    assert MC.extract_numbers("12.5") == ["12.5"]


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
    assert MC.number_status("3개의 항목 중 2번째", "the 2nd of 3 items") == "all_match"
    assert MC.number_status("5개", "five items") == "all_match"  # word mapping
    assert MC.number_status("7개", "three items") == "no_match"
    assert MC.number_status("항목", "items") == "no_numbers"
    assert MC.number_status("1과 2", "1 and 5") == "partial_match"


def test_pair_class():
    assert MC.pair_class(None, "x") == "invalid_input"
    assert MC.pair_class(" ", "x") == "empty"
    assert MC.pair_class("no korean", "none") == "no_korean_in_kor"
    assert MC.pair_class("좋다.", "Good.") == "all_match"
    assert MC.pair_class("좋다? 네.", "Good.") == "partial_match"
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
    assert got[0]["number_status"] == "all_match"
    assert got[2]["pair_class"] == "no_korean_in_kor"


def test_word_status_variants():
    # untranslated latin terms in the kr side must appear in en
    assert MC.word_status("IMO 규정에 따라 ballast-water 처리", "per IMO rules, treat ballast water") == "all_match"
    assert MC.word_status("tanks 점검", "inspect the tank") == "all_match"  # plural variant
    assert MC.word_status("제 iii 장", "chapter 3") == "all_match"  # roman numeral
    assert MC.word_status("SOLAS 및 MARPOL", "per SOLAS only") == "partial_match"
    assert MC.word_status("ABC 항목", "nothing relevant") == "no_match"
    assert MC.word_status("한국어만", "english only") == "no_english_in_kr"


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
    """'이중' on the kr side must pair with 'double' on the en side."""
    from pdf_extract_spark.operators.metacompare import number_status

    assert number_status("이중 격벽 구조", "double hull structure") == "all_match"
    assert number_status("이중 격벽과 3개의 탱크", "double hull and three tanks") == "all_match"
    assert number_status("이중 격벽", "single hull") == "no_match"
    assert number_status("격벽 구조", "hull structure") == "no_numbers"


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
