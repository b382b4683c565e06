"""Question cleaner port (clean_questions.py:45-139 semantics)."""

from multivac_spark.functions.questions import REMOVED_TOKEN, clean_question
from multivac_spark.sources import vocab


def _lex():
    return frozenset(vocab.pos_lexicon())


def test_prefix_strip_and_capitalize():
    # numbered-list prefix removed, first letter capitalized
    out = clean_question("1. what does the virus infect?", _lex())
    assert out == "What does the virus infect?"


def test_citation_token_removed():
    out = clean_question("what NumericCitation does the cell produce?",
                         _lex())
    assert "Citation" not in out
    assert out.startswith("What")


def test_low_real_word_ratio_removed():
    # mostly junk tokens → below 20% vocabulary words → removed
    out = clean_question("zzz qqq xxx www yyy kkk", _lex())
    assert out == REMOVED_TOKEN


def test_too_short_removed():
    assert clean_question("ok", _lex()) == REMOVED_TOKEN


def test_last_sentence_taken():
    text = ("The virus infects the cell. "
            "What does the protein activate?")
    out = clean_question(text, _lex())
    assert out == "What does the protein activate?"


def test_stage(spark):
    df = spark.createDataFrame(
        [(1, "2. what does the virus infect?"),
         (2, "zzz qqq xxx www yyy"),
         (3, None)],
        "qid long, question string")
    from multivac_spark.functions.questions import clean_questions_stage
    rows = clean_questions_stage(df, _lex()).collect()
    assert len(rows) == 1
    assert rows[0]["question"].startswith("What")
