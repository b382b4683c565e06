"""Rule-based coref resolution (optional stage)."""

from multivac_spark.functions.coref import resolve_pronouns
from multivac_spark.functions.svo import extract_svo
from multivac_spark.functions.parse import parse_document
from multivac_spark.plans.pipeline import default_lexicons


def test_pronoun_replaced_by_previous_subject():
    lex, lemmas = default_lexicons()
    text = "The viral genome infects the cell. It activates the enzyme."
    out = resolve_pronouns(text, lex, lemmas)
    assert out == ("The viral genome infects the cell. "
                   "The viral genome activates the enzyme.")


def test_no_pronoun_no_change():
    lex, lemmas = default_lexicons()
    text = "The virus infects the cell. The protein binds the receptor."
    assert resolve_pronouns(text, lex, lemmas) == text


def test_pronoun_without_antecedent_kept():
    lex, lemmas = default_lexicons()
    text = "It activates the enzyme."
    assert resolve_pronouns(text, lex, lemmas) == text


def test_coref_recovers_triples():
    """After resolution, the second sentence yields a real-subject triple."""
    lex, lemmas = default_lexicons()
    text = "The virus infects the cell. It activates the enzyme."
    resolved = resolve_pronouns(text, lex, lemmas)
    parsed = parse_document(resolved, lex, lemmas)
    triples = [t for _, _, toks in parsed for t in extract_svo(toks)]
    subjects = {t[1] for t in triples}
    assert any("virus" in s for s in subjects)
    # both sentences produced triples with the virus as subject
    assert sum("virus" in t[1] for t in triples) == 2
