"""Closed synthetic vocabulary + grammar lexicon.

The corpus synthesizer (``corpus.py``) generates Common-Crawl-style
science pages whose sentences come from a closed grammar over this
lexicon, so the gold dependency parse — and therefore the gold SVO
triples — are derivable exactly (FIXTURES.md §1).

Concepts carry surface variants (``virus`` / ``viruses`` / ``virusses``)
whose synthetic embeddings are within cosine distance 0.1 of the base
form while unrelated concepts sit ≥0.5 apart, giving the 0.2 clustering
threshold of the reference (rdf_graph.py:52) real signal.

Everything is deterministic: no wall clock, no unseeded randomness.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

EMBED_DIM = 50

# ~125 base noun concepts; the generator inflects them with VARIANT_SUFFIXES
# to reach the "~500 nouns" FIXTURES.md target with built-in near-duplicates.
NOUN_CONCEPTS = [
    "virus", "cell", "protein", "genome", "pathogen", "antibody", "enzyme",
    "receptor", "membrane", "molecule", "bacterium", "infection", "mutation",
    "sequence", "vaccine", "epidemic", "outbreak", "population", "model",
    "parameter", "equation", "simulation", "network", "node", "graph",
    "cluster", "distribution", "sample", "dataset", "experiment", "result",
    "analysis", "method", "algorithm", "system", "process", "structure",
    "function", "dynamic", "rate", "ratio", "threshold", "boundary",
    "condition", "state", "transition", "probability", "estimate", "error",
    "variance", "signal", "noise", "frequency", "amplitude", "wave",
    "particle", "field", "force", "energy", "mass", "velocity", "momentum",
    "temperature", "pressure", "volume", "density", "gradient", "flux",
    "reaction", "catalyst", "compound", "solution", "crystal", "polymer",
    "tissue", "organ", "neuron", "synapse", "cortex", "stimulus", "response",
    "behavior", "species", "habitat", "ecosystem", "climate", "region",
    "surface", "layer", "interface", "domain", "lattice", "matrix", "vector",
    "tensor", "operator", "spectrum", "orbit", "galaxy", "star", "planet",
    "atmosphere", "ocean", "mineral", "isotope", "electron", "photon",
    "quark", "plasma", "laser", "sensor", "detector", "instrument", "device",
    "circuit", "antenna", "robot", "agent", "policy", "strategy", "theory",
    "hypothesis", "observation", "measurement", "researcher", "patient",
    "cohort", "treatment", "therapy", "dose", "biomarker", "phenotype",
]

# verb concept -> (3sg present, plural present, past, lemma)
VERB_FORMS = {
    "infect": ("infects", "infect", "infected"),
    "bind": ("binds", "bind", "bound"),
    "activate": ("activates", "activate", "activated"),
    "inhibit": ("inhibits", "inhibit", "inhibited"),
    "regulate": ("regulates", "regulate", "regulated"),
    "encode": ("encodes", "encode", "encoded"),
    "express": ("expresses", "express", "expressed"),
    "produce": ("produces", "produce", "produced"),
    "consume": ("consumes", "consume", "consumed"),
    "absorb": ("absorbs", "absorb", "absorbed"),
    "emit": ("emits", "emit", "emitted"),
    "transmit": ("transmits", "transmit", "transmitted"),
    "attack": ("attacks", "attack", "attacked"),
    "destroy": ("destroys", "destroy", "destroyed"),
    "protect": ("protects", "protect", "protected"),
    "mutate": ("mutates", "mutate", "mutated"),
    "replicate": ("replicates", "replicate", "replicated"),
    "cause": ("causes", "cause", "caused"),
    "prevent": ("prevents", "prevent", "prevented"),
    "reduce": ("reduces", "reduce", "reduced"),
    "increase": ("increases", "increase", "increased"),
    "predict": ("predicts", "predict", "predicted"),
    "measure": ("measures", "measure", "measured"),
    "observe": ("observes", "observe", "observed"),
    "simulate": ("simulates", "simulate", "simulated"),
    "estimate": ("estimates", "estimate", "estimated"),
    "compute": ("computes", "compute", "computed"),
    "describe": ("describes", "describe", "described"),
    "explain": ("explains", "explain", "explained"),
    "reveal": ("reveals", "reveal", "revealed"),
    "suggest": ("suggests", "suggest", "suggested"),
    "confirm": ("confirms", "confirm", "confirmed"),
    "support": ("supports", "support", "supported"),
    "contradict": ("contradicts", "contradict", "contradicted"),
    "target": ("targets", "target", "targeted"),
    "modify": ("modifies", "modify", "modified"),
    "trigger": ("triggers", "trigger", "triggered"),
    "suppress": ("suppresses", "suppress", "suppressed"),
    "enhance": ("enhances", "enhance", "enhanced"),
    "degrade": ("degrades", "degrade", "degraded"),
    "stabilize": ("stabilizes", "stabilize", "stabilized"),
    "disrupt": ("disrupts", "disrupt", "disrupted"),
    "accelerate": ("accelerates", "accelerate", "accelerated"),
    "attenuate": ("attenuates", "attenuate", "attenuated"),
    "amplify": ("amplifies", "amplify", "amplified"),
    "capture": ("captures", "capture", "captured"),
    "release": ("releases", "release", "released"),
    "transport": ("transports", "transport", "transported"),
    "synthesize": ("synthesizes", "synthesize", "synthesized"),
    "metabolize": ("metabolizes", "metabolize", "metabolized"),
    "colonize": ("colonizes", "colonize", "colonized"),
    "dominate": ("dominates", "dominate", "dominated"),
    "approximate": ("approximates", "approximate", "approximated"),
    "characterize": ("characterizes", "characterize", "characterized"),
    "quantify": ("quantifies", "quantify", "quantified"),
    "validate": ("validates", "validate", "validated"),
    "govern": ("governs", "govern", "governed"),
    "control": ("controls", "control", "controlled"),
    "influence": ("influences", "influence", "influenced"),
    "determine": ("determines", "determine", "determined"),
}

ADJECTIVES = [
    "viral", "cellular", "molecular", "genetic", "bacterial", "immune",
    "novel", "robust", "stable", "unstable", "rapid", "slow", "large",
    "small", "dense", "sparse", "linear", "nonlinear", "stochastic",
    "deterministic", "thermal", "optical", "magnetic", "electric",
    "chemical", "physical", "biological", "clinical", "empirical",
    "theoretical", "numerical", "statistical", "spatial", "temporal",
    "dynamic", "static", "complex", "simple", "efficient", "effective",
    "significant", "critical", "dominant", "recessive", "active",
    "passive", "positive", "negative", "primary", "secondary", "global",
    "local", "discrete", "continuous", "uniform", "random", "periodic",
    "chaotic", "resistant", "susceptible", "infectious", "pathogenic",
    "synthetic", "natural", "artificial", "experimental", "observed",
    "predicted", "estimated", "measured", "normalized", "optimal",
    "minimal", "maximal", "mean", "median", "asymptotic", "marginal",
    "conditional", "latent",
]

ADVERBS = [
    "rapidly", "slowly", "strongly", "weakly", "significantly",
    "consistently", "frequently", "rarely", "directly", "indirectly",
    "efficiently", "selectively", "spontaneously", "gradually",
    "substantially", "partially", "completely", "reversibly",
]

DETERMINERS = ["the", "a", "this", "each", "every", "another"]
PREPOSITIONS = ["in", "of", "with", "under", "across", "within", "during"]

# Variant suffix machinery: concept -> list of surface variants. Variant 0
# is the base form. These are the near-duplicate mentions canonicalization
# must merge (FIXTURES.md §2).
_VARIANT_RULES = [
    lambda w: w,                       # base
    lambda w: w + "es" if w.endswith(("s", "x", "ch", "sh")) else w + "s",
    lambda w: w + "oid",
    lambda w: w + "al" if not w.endswith("al") else w + "ic",
]
N_VARIANTS = len(_VARIANT_RULES)


@lru_cache(maxsize=1)
def noun_variants() -> dict[str, list[str]]:
    """concept -> surface variants (index 0 = base form)."""
    return {c: [r(c) for r in _VARIANT_RULES] for c in NOUN_CONCEPTS}


@lru_cache(maxsize=1)
def all_nouns() -> list[str]:
    out: list[str] = []
    for c in NOUN_CONCEPTS:
        out.extend(noun_variants()[c])
    return out


@lru_cache(maxsize=1)
def pos_lexicon() -> dict[str, str]:
    """surface form -> Penn-ish POS tag. Closed-world: the deterministic
    parser (functions/parse.py) resolves every grammar token through this
    table; unknown tokens default to NN downstream.

    Ambiguity policy: verb forms win every collision ("measured" JJ vs
    VBD, "estimates" NNS vs VBZ). The grammar only *samples* surface
    forms whose lexicon tag matches the intended slot (see the
    effective_* helpers), so gold parses stay exact."""
    lex: dict[str, str] = {}
    for d in DETERMINERS:
        lex[d] = "DT"
    for p in PREPOSITIONS:
        lex[p] = "IN"
    for a in ADJECTIVES:
        lex[a] = "JJ"
    for a in ADVERBS:
        lex[a] = "RB"
    for n in all_nouns():
        lex.setdefault(n, "NNS" if n.endswith("s") else "NN")
    for lemma, (sg, pl, past) in VERB_FORMS.items():
        lex[sg] = "VBZ"
        lex[past] = "VBD"
        lex[pl] = "VBP"
    return lex


@lru_cache(maxsize=1)
def effective_adjectives() -> list[str]:
    lex = pos_lexicon()
    return [a for a in ADJECTIVES if lex[a] == "JJ"]


@lru_cache(maxsize=1)
def effective_noun_variants() -> dict[str, list[str]]:
    """concept -> sampleable variants (all tagging NN*); concepts whose
    base form is ambiguous are dropped from sampling entirely."""
    lex = pos_lexicon()
    out: dict[str, list[str]] = {}
    for c, variants in noun_variants().items():
        ok = [v for v in variants if lex[v].startswith("NN")]
        if ok and ok[0] == variants[0]:
            out[c] = ok
    return out


@lru_cache(maxsize=1)
def effective_concepts() -> list[str]:
    return [c for c in NOUN_CONCEPTS if c in effective_noun_variants()]


@lru_cache(maxsize=1)
def verb_lemma_table() -> dict[str, str]:
    """surface verb form -> lemma (the rebuild's WordNet-verb-lemmatizer
    stand-in for the closed vocabulary; rdf_graph.py:352,366)."""
    tab: dict[str, str] = {}
    for lemma, forms in VERB_FORMS.items():
        tab[lemma] = lemma
        for f in forms:
            tab.setdefault(f, lemma)
    # auxiliary forms the reference's 'be'-drop rule needs (rdf_graph.py:374)
    for f in ("is", "are", "was", "were", "be", "been", "being"):
        tab[f] = "be"
    return tab


def _unit(vec: np.ndarray) -> np.ndarray:
    return vec / np.linalg.norm(vec)


def _seeded_vec(key: str, dim: int = EMBED_DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return _unit(rng.standard_normal(dim))


def embedding_rows() -> list[tuple[str, list[float]]]:
    """(token, vector) rows for the synthetic ``embeddings`` table.

    Base concept tokens get independent seeded unit vectors (random
    50-d unit vectors are ≥~0.5 apart in cosine distance whp); variants
    get base + small noise renormalized, keeping them within cosine
    distance ~0.1 of the base (FIXTURES.md §2). Verbs / adjectives /
    etc. get independent vectors (relations are only clustered when
    flag-gated, rdf_extract.py:119-122).
    """
    rows: list[tuple[str, list[float]]] = []
    seen: set[str] = set()

    def add(token: str, vec: np.ndarray) -> None:
        if token not in seen:
            seen.add(token)
            rows.append((token, [float(x) for x in vec]))

    for concept, variants in noun_variants().items():
        base = _seeded_vec("noun:" + concept)
        for vi, form in enumerate(variants):
            if vi == 0:
                add(form, base)
            else:
                noise = _seeded_vec(f"var:{concept}:{vi}") * 0.25
                add(form, _unit(base + noise))
    for lemma, forms in VERB_FORMS.items():
        base = _seeded_vec("verb:" + lemma)
        add(lemma, base)
        for f in forms:
            add(f, _unit(base + _seeded_vec("vform:" + f) * 0.2))
    for adj in ADJECTIVES:
        add(adj, _seeded_vec("adj:" + adj))
    for adv in ADVERBS:
        add(adv, _seeded_vec("adv:" + adv))
    for w in DETERMINERS + PREPOSITIONS:
        add(w, _seeded_vec("fn:" + w))
    return rows


def zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    """Zipf(s) probability weights over ranks 1..n — the deliberate skew
    that makes unsalted groupBy(pred) straggle (SURVEY.md §7.3)."""
    w = 1.0 / np.arange(1, n + 1) ** s
    return w / w.sum()
