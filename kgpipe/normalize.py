"""Text normalization: offset-preserving tokenization, case/digit folding,
Porter stemming, stopword handling.

Re-expresses the normalization knobs of the reference ConceptMapper pipeline
(knob vocabulary: ``ConceptMapperEvalOutputCompiler.java:83-100`` — CaseMatch,
Stemmer, Stopwords, SearchStrategy, OrderIndependentLookup, FindAllMatches,
SynonymType) and the Penn-Treebank-style tokenizer the reference ships
(``PennTreebankTokenizer.java:28-60``).  Everything here is pure Python — it
runs inside Arrow-batched pandas UDFs on executors and driver-side during
dictionary builds, so it must be dependency-free and fast.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

# Alphanumeric runs; apostrophes inside words kept out (ConceptMapper's
# OffsetTokenizer treats punctuation as delimiters).  Offset-preserving: we
# never rewrite the source text (SURVEY.md "hard parts": match on a normalized
# shadow, report original offsets).
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Return ``[(token, begin, end)]`` with char offsets into *text*."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


# ---------------------------------------------------------------------------
# Penn Treebank tokenizer (offset-preserving)
# ---------------------------------------------------------------------------
# The reference ships the MorphAdorner variant of Robert McIntyre's public
# PTB tokenizer.sed rewrite cascade (``PennTreebankTokenizer.java:28-60``,
# itself "based upon the sed script ... at
# http://www.cis.upenn.edu/~treebank/tokenizer.sed") to back the
# BIOLEMMATIZER normalization path.  Every rule in the cascade only INSERTS
# whitespace or collapses existing whitespace — token characters are never
# altered — so tokens of the rewritten string are contiguous substrings of
# the original, and offsets are recoverable by a single left-to-right
# alignment pass.  Rules below follow the cascade's exact order.

_PTB_RULES: list[tuple[re.Pattern, str]] = [
    (re.compile(p), r) for p, r in [
        (r"``", "`` "),
        (r"''", "  ''"),
        (r'([?!".,;:@#$%&])', r" \1 "),
        (r"\.\.\.", " ... "),
        (r"\s+", " "),
        (r",([^0-9])", r" , \1"),
        (r'([^.])([.])([\])}>"\']*)\s*$', r"\1 \2\3 "),
        (r"([\[\](){}<>])", r" \1 "),
        (r"--", " -- "),
        (r"$", " "),
        (r"^", " "),
        (r"([^'])' ", r"\1 ' "),
        (r"'([sSmMdD]) ", r" '\1 "),
        (r"'ll ", " 'll "),
        (r"'re ", " 're "),
        (r"'ve ", " 've "),
        (r"'em ", " 'em "),
        (r"n't ", " n't "),
        (r"'LL ", " 'LL "),
        (r"'RE ", " 'RE "),
        (r"'EM ", " 'EM "),
        (r"'VE ", " 'VE "),
        (r"N'T ", " N'T "),
        (r" ([Cc])annot ", r" \1an not "),
        (r" ([Dd])'ye ", r" \1' ye "),
        (r" ([Gg])imme ", r" \1im me "),
        (r" ([Gg])onna ", r" \1on na "),
        (r" ([Gg])otta ", r" \1ot ta "),
        (r" ([Ll])emme ", r" \1em me "),
        (r" ([Mm])ore'n ", r" \1ore 'n "),
        (r" '([Tt])is ", r" '\1 is "),
        (r" '([Tt])was ", r" '\1 was "),
        (r" ([Ww])anna ", r" \1an na "),
        (r" ([Ww])haddya ", r" \1ha dd ya "),
        (r" ([Ww])hatcha ", r" \1ha t cha "),
        (r"([A-MO-Za-mo-z])'([tT])", r"\1 '\2"),
        (r" ([A-Z]) \.", r" \1. "),
        (r"\s+", " "),
        (r"^\s+", ""),
    ]
]


def ptb_tokenize(text: str) -> list[str]:
    """Penn Treebank tokens of *text* via the literal rewrite cascade."""
    s = text
    for pat, rep in _PTB_RULES:
        s = pat.sub(rep, s)
    return [t for t in s.split(" ") if t]


def ptb_tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """``[(token, begin, end)]`` under PTB tokenization, offsets into the
    ORIGINAL text.  The cascade never alters non-whitespace characters, but
    one rule DELETES a space (``" ([A-Z]) \\." → " \\1. "`` rejoins an
    initial with its period), so a token's characters appear in the
    original in order, possibly with whitespace between them — alignment
    walks char-by-char skipping whitespace, and the span covers first
    through last character (``text[begin:end]`` equals the token up to
    interior whitespace)."""
    out: list[tuple[str, int, int]] = []
    pos = 0
    n = len(text)
    for tok in ptb_tokenize(text):
        start = None
        for ch in tok:
            while pos < n and text[pos] != ch and text[pos].isspace():
                pos += 1
            if pos >= n or text[pos] != ch:
                # unreachable given the cascade's insert/collapse-whitespace
                # behaviour; defensive for future rule edits
                raise ValueError(f"cannot align PTB token {tok!r} at {pos}")
            if start is None:
                start = pos
            pos += 1
        if start is not None:
            out.append((tok, start, pos))
    return out


# Sentence/chunk boundaries: the reference runs ConceptMapper per sentence and
# treats line breaks as sentence boundaries
# (``CraftConceptMapperEvaluator.java:201-206``).  Matches never cross chunks.
_SENT_BOUND_RE = re.compile(r"\n|(?<=[.!?])\s+(?=[A-Z(\[])")


def chunk_spans(text: str) -> list[tuple[int, int]]:
    """Split *text* into chunk (sentence-ish) spans; offsets into text."""
    spans: list[tuple[int, int]] = []
    start = 0
    for m in _SENT_BOUND_RE.finditer(text):
        if m.start() > start:
            spans.append((start, m.start()))
        start = m.end()
    if start < len(text):
        spans.append((start, len(text)))
    return spans


# ---------------------------------------------------------------------------
# Porter stemmer (classic algorithm, Porter 1980 — public domain description)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in *stem*."""
    m = 0
    prev_cons = True
    seen_vowel = False
    for i in range(len(stem)):
        c = _is_cons(stem, i)
        if not c:
            seen_vowel = True
        elif seen_vowel:
            m += 1
            seen_vowel = False
        prev_cons = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    return (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Porter-stem a lowercase word. Words of length <= 2 unchanged."""
    if len(word) <= 2:
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and _measure(w[:-3]) > 1 and w[:-3].endswith(("s", "t")):
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Stopwords — the public PubMed stopword list (NLM help documentation),
# selected by the reference's Stopwords:PUBMED knob
# (``ConceptMapperEvalOutputCompiler.java:94-95``).
# ---------------------------------------------------------------------------

PUBMED_STOPWORDS = frozenset(
    """a about again all almost also although always among an and another any
    are as at be because been before being between both but by can could did
    do does done due during each either enough especially etc for found from
    further had has have having here how however i if in into is it its itself
    just kg km made mainly make may mg might ml mm most mostly must nearly
    neither no nor obtained of often on our overall perhaps pmid quite rather
    really regarding seem seen several should show showed shown shows
    significantly since so some such than that the their theirs them then
    there therefore these they this those through thus to upon use used using
    various very was we were what when which while with within without would
    """.split()
)

# ---------------------------------------------------------------------------
# Knob configuration (D13 in SURVEY.md §1.1)
# ---------------------------------------------------------------------------

SEARCH_CONTIGUOUS = "CONTIGUOUS_MATCH"
SEARCH_SKIP_ANY = "SKIP_ANY_MATCH"
SEARCH_SKIP_ANY_OVERLAP = "SKIP_ANY_MATCH_ALLOW_OVERLAP"

CASE_SENSITIVE = "CASE_SENSITIVE"
CASE_INSENSITIVE = "CASE_INSENSITIVE"
CASE_IGNORE = "CASE_IGNORE"
CASE_FOLD_DIGITS = "CASE_FOLD_DIGITS"

STEM_NONE = "NONE"
STEM_PORTER = "PORTER"
# BIOLEMMATIZER approximates the reference's BioLemmatizer
# (ConceptMapperEvalOutputCompiler.java:92-94; the full external model is
# unavailable here): an irregular-inflection lemma table (IRREGULAR_LEMMAS)
# maps the surface form to its lemma BEFORE the shared Porter pass, so
# "mice"→"mouse"→Porter matches a dictionary "mouse" that Porter alone
# never reaches.  Regular inflections reduce through Porter as before, so
# BIOLEMMATIZER ⊇ PORTER matches and diverges exactly on irregular forms —
# the way the reference's grid permutations diverge.
STEM_BIOLEMMATIZER = "BIOLEMMATIZER"

# Irregular English inflections (common nouns/verbs + Latin/Greek plurals
# frequent in biomedical text).  Inflected form → lemma; the lemma then
# flows through the SAME Porter pass the dictionary side uses, keeping
# text-side and dictionary-side normalization aligned.
IRREGULAR_LEMMAS: dict[str, str] = {
    # irregular plural nouns
    "mice": "mouse", "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "lice": "louse",
    "oxen": "ox", "people": "person",
    # Latin/Greek plurals (biomedical staples)
    "bacteria": "bacterium", "mitochondria": "mitochondrion",
    "nuclei": "nucleus", "fungi": "fungus", "larvae": "larva",
    "genera": "genus", "taxa": "taxon", "cilia": "cilium",
    "flagella": "flagellum", "ova": "ovum", "stimuli": "stimulus",
    "loci": "locus", "foci": "focus", "septa": "septum", "villi": "villus",
    "glomeruli": "glomerulus", "bronchi": "bronchus", "alveoli": "alveolus",
    "ganglia": "ganglion", "spermatozoa": "spermatozoon", "soma": "soma",
    "somata": "soma", "vertebrae": "vertebra", "axes": "axis",
    "analyses": "analysis", "hypotheses": "hypothesis",
    "diagnoses": "diagnosis", "syntheses": "synthesis",
    "matrices": "matrix", "indices": "index", "vertices": "vertex",
    "cortices": "cortex", "appendices": "appendix",
    "criteria": "criterion", "phenomena": "phenomenon", "data": "datum",
    # irregular verbs (past/participle → base)
    "ran": "run", "went": "go", "gone": "go", "ate": "eat", "eaten": "eat",
    "saw": "see", "seen": "see", "took": "take", "taken": "take",
    "gave": "give", "given": "give", "made": "make", "found": "find",
    "did": "do", "done": "do", "had": "have", "has": "have",
    "said": "say", "got": "get", "came": "come", "grew": "grow",
    "grown": "grow", "bound": "bind", "bred": "breed", "fed": "feed",
    "held": "hold", "kept": "keep", "led": "lead", "left": "leave",
    "lost": "lose", "met": "meet", "sent": "send", "showed": "show",
    "shown": "show", "spent": "spend", "taught": "teach",
    "thought": "think", "understood": "understand", "wrote": "write",
    "written": "write", "drew": "draw", "drawn": "draw",
    "chose": "choose", "chosen": "choose", "arose": "arise",
    "arisen": "arise", "became": "become", "began": "begin",
    "begun": "begin", "broke": "break", "broken": "break",
    "brought": "bring", "built": "build", "bought": "buy",
    "caught": "catch", "fell": "fall", "fallen": "fall", "felt": "feel",
    "flew": "fly", "flown": "fly", "froze": "freeze", "frozen": "freeze",
    "hid": "hide", "hidden": "hide", "knew": "know", "known": "know",
    "meant": "mean", "rose": "rise", "risen": "rise", "sought": "seek",
    "sold": "sell", "spoke": "speak", "spoken": "speak",
    "stood": "stand", "swam": "swim", "swum": "swim", "threw": "throw",
    "thrown": "throw", "underwent": "undergo", "undergone": "undergo",
    "withdrew": "withdraw", "withdrawn": "withdraw", "won": "win",
    "wore": "wear", "worn": "wear", "woke": "wake", "woken": "wake",
    "was": "be", "were": "be", "been": "be", "is": "be", "are": "be",
}

STOP_NONE = "NONE"
STOP_PUBMED = "PUBMED"

SYN_EXACT_ONLY = "EXACT_ONLY"
SYN_ALL = "ALL"


@dataclass(frozen=True)
class MatchConfig:
    """The 7-knob ConceptMapper parameter combination
    (``ConceptMapperEvalOutputCompiler.java:83-100``)."""

    search_strategy: str = SEARCH_CONTIGUOUS
    case_match: str = CASE_INSENSITIVE
    stemmer: str = STEM_PORTER
    stopwords: str = STOP_NONE
    order_independent: bool = False
    find_all_matches: bool = False
    synonym_type: str = SYN_ALL

    def normalize_token(self, tok: str) -> str:
        # CaseMatch semantics follow UIMA-sandbox ConceptMapper's
        # CaseMatchParam: IGNORE folds everything; INSENSITIVE folds unless
        # the token is all-caps (acronyms stay case-significant);
        # FOLD_DIGITS folds only digit-containing tokens.
        t = tok
        if self.case_match == CASE_IGNORE:
            t = t.lower()
        elif self.case_match == CASE_INSENSITIVE:
            if not (len(t) > 1 and t.isupper()):
                t = t.lower()
        elif self.case_match == CASE_FOLD_DIGITS:
            if any(c.isdigit() for c in t):
                t = t.lower()
        if self.stemmer in (STEM_PORTER, STEM_BIOLEMMATIZER) and t.islower():
            if self.stemmer == STEM_BIOLEMMATIZER:
                t = IRREGULAR_LEMMAS.get(t, t)
            t = porter_stem(t)
        return t

    def is_stopword(self, tok: str) -> bool:
        return self.stopwords == STOP_PUBMED and tok.lower() in PUBMED_STOPWORDS


# Per-ontology optimized configurations. The reference pins per-ontology
# param indices (GO_CC=31, GO_MF=111, GO_BP=28, GO=30, SO=31, PR=478, CL=31,
# NCBI_TAXON=535, CHEBI=13, default=31 — ``EntityFinder.java:133-170``,
# ``ConceptMapperParams.java:47-63``, from Funk et al. 2014, BMC
# Bioinformatics 15:59).  The index→knob decoding lives in an external
# artifact; the configs below encode the published Funk et al. winning
# settings per ontology and are calibrated against the reference's golden
# `.a1` outputs (tests/test_parity.py).
# Calibration (tests/test_parity.py) against the reference golden `.a1`
# outputs found index 31 ≡ (CONTIGUOUS, CASE_INSENSITIVE, PORTER, no
# stopwords, order-dependent, longest-only, EXACT_ONLY): CL P=R=1.0,
# DOID P=0.96 R=1.0.
_IDX31 = MatchConfig(SEARCH_CONTIGUOUS, CASE_INSENSITIVE, STEM_PORTER,
                     STOP_NONE, False, False, SYN_EXACT_ONLY)
ONTOLOGY_CONFIGS: dict[str, MatchConfig] = {
    "CL": _IDX31,            # index 31
    "GO_CC": _IDX31,         # index 31
    "GO_BP": MatchConfig(SEARCH_CONTIGUOUS, CASE_INSENSITIVE, STEM_PORTER,
                         STOP_NONE, False, False, SYN_ALL),          # 28
    "GO_MF": MatchConfig(SEARCH_CONTIGUOUS, CASE_INSENSITIVE, STEM_PORTER,
                         STOP_PUBMED, False, False, SYN_ALL),        # 111
    "SO": _IDX31,            # index 31
    "PR": MatchConfig(SEARCH_CONTIGUOUS, CASE_SENSITIVE, STEM_NONE,
                      STOP_NONE, True, False, SYN_ALL),              # 478
    "CHEBI": MatchConfig(SEARCH_CONTIGUOUS, CASE_INSENSITIVE, STEM_NONE,
                         STOP_NONE, False, False, SYN_EXACT_ONLY),   # 13
    "NCBI_TAXON": MatchConfig(SEARCH_CONTIGUOUS, CASE_SENSITIVE, STEM_NONE,
                              STOP_NONE, True, False, SYN_ALL),      # 535
    "DOID": _IDX31,          # index 31
    "HP": _IDX31,            # index 31
    "DEFAULT": _IDX31,       # OBO default = index 31
}


def config_for(ontology: str) -> MatchConfig:
    return ONTOLOGY_CONFIGS.get(ontology, ONTOLOGY_CONFIGS["DEFAULT"])
