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


def test_object_pronoun_respects_binding():
    """A pronoun object cannot corefer with its own clause's subject
    (binding constraint) — it resolves to the previous sentence's
    subject instead."""
    lex, lemmas = default_lexicons()
    out = resolve_pronouns(
        "The virus infects the cell. The protein binds it.", lex, lemmas)
    assert out == ("The virus infects the cell. "
                   "The protein binds The virus.")


def test_head_match_canonicalizes_np_variants():
    """Sieve 2: 'the genome' merges with 'The viral genome' (same head,
    content containment) and is replaced by the representative."""
    lex, lemmas = default_lexicons()
    out = resolve_pronouns(
        "The viral genome replicates. The genome mutates.", lex, lemmas)
    assert out == ("The viral genome replicates. "
                   "The viral genome mutates.")


def test_plural_pronoun_requires_plural_antecedent():
    lex, lemmas = default_lexicons()
    out = resolve_pronouns(
        "The cells activate the protein. They bind the receptor.",
        lex, lemmas)
    assert out == ("The cells activate the protein. "
                   "The cells bind the receptor.")


def test_pronoun_prefers_nearest_sentence_subject():
    lex, lemmas = default_lexicons()
    out = resolve_pronouns(
        "The virus activates the enzyme. The cell binds the receptor. "
        "It mutates.", lex, lemmas)
    assert out.endswith("The cell mutates.")


def test_exact_match_cluster_feeds_pronoun():
    """Sieve 1 merges the two 'The enzyme' mentions; the pronoun joins
    the cluster and takes the earliest mention as representative."""
    lex, lemmas = default_lexicons()
    out = resolve_pronouns(
        "The enzyme activates the cell. The enzyme binds the receptor. "
        "It mutates.", lex, lemmas)
    assert out.endswith("The enzyme mutates.")


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
