"""Text analysis: tokenizers as vectorized Arrow/pandas UDFs.

Mirrors the reference's analyzer behavior (QryParser.java:45-51,
QryParser.tokenizeString QryParser.java:442-459): lowercase, punctuation
splitting (``near-death`` -> ``near``, ``death``), optional stopword removal
and Krovetz-style stemming. Two registered analyzers:

- ``simple``  — lowercase + ``[a-z0-9]+`` extraction; no stopwords, no stem.
  (Exactly reproducible in ANSI SQL / DuckDB for the correctness oracle.)
- ``english`` — same tokenization, Lucene-style English stopword removal with
  **position slots preserved** (stopword -> empty string, mirroring the
  TermVector stem-0 convention, TermVector.java:18-20), plus a light
  Krovetz-style inflectional stemmer (HW1-5 behavior; pass ``stem=False``
  for the HW6 no-stem configuration, QryParser.java:48-50).

The same pure-Python functions run inside pandas UDFs (executor side) and in
the test oracle (driver side), so index and oracle tokenize identically.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

TOKEN_RE = re.compile(r"[a-z0-9]+")

# Lucene EnglishAnalyzer default stop set (public, org.apache.lucene.analysis.en)
LUCENE_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)


# KStem is dictionary-first (Krovetz '93, "Viewing morphology as an
# inference process"; behavior as shipped in Lucene's KStemmer): a word
# found in the lexicon is returned as-is (or via a direct-conflation
# entry) BEFORE any suffix rule fires, and every suffix step checks
# candidate stems against the lexicon before falling back to spelling
# heuristics. This module implements that full multi-step algorithm
# with an embedded HEAD lexicon (~700 high-frequency entries) instead
# of the complete ~30k KStemData tables (not shippable here): for
# lexicon words and their regular inflections the behavior is
# dictionary-exact; for out-of-lexicon words the documented heuristic
# fallbacks apply. Both tables are replayed verbatim in the DuckDB
# oracle (gate._kstem_sql builds its CASE arms from THESE — single
# source of truth), and >=1k input->output pairs are pinned in
# tests/test_kstem_golden.py.

# Direct conflations: irregular morphology the rules cannot derive
# (KStem resolves these through dictionary entries).
KSTEM_EXCEPTIONS: dict[str, str] = {
    # length-guard casualties of the regular rules
    "died": "die", "tied": "tie", "lied": "lie", "used": "use",
    "using": "use", "dying": "die", "lying": "lie", "tying": "tie",
    "quizzes": "quiz",
    # irregular plurals
    "women": "woman", "men": "man", "children": "child", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "oxen": "ox",
    "gentlemen": "gentleman", "businessmen": "businessman",
    "policemen": "policeman", "firemen": "fireman",
    "spokesmen": "spokesman", "chairmen": "chairman",
    "congressmen": "congressman", "fishermen": "fisherman",
    "salesmen": "salesman", "freshmen": "freshman",
    # -f/-fe plurals
    "wives": "wife", "knives": "knife", "wolves": "wolf",
    "shelves": "shelf", "halves": "half", "selves": "self",
    "thieves": "thief", "loaves": "loaf", "scarves": "scarf",
    "calves": "calf", "elves": "elf",
}

# Head lexicon: high-frequency words the dictionary-first steps check.
# Membership means "return as-is when seen whole, and accept as a stem
# candidate inside the plural / past-tense / progressive steps".
KSTEM_LEXICON: frozenset = frozenset("""
accomplish account achieve act actor add address admit adopt advance afford
agree airport burn career census driver envy merge pick player right ring
suspect talk virus
aid aim alarm alert alias allow always amount analysis animal answer
anything appear apply approach area argue arm army arrange arrest arrive
artist ask assist atlas attach attack attempt attend aunt autumn avoid award
baby back balance bank base basis bathe bear beat bed begin being believe
besides bias bird blast bleed block board boat body boil bomb bone book
boost borrow bottle bottom box boy branch brand breath breathe breed brick
bridge bring brush build building bus business buzz call calm camera camp
campus canvas car card care carry case castle cat catch cause cave ceiling
cell center century chain chair chairman challenge chance change chaos
charge chart chase chat check cheer child choose church circle cite city
claim clap class classify clean clear climb clock close clothes clothing
cloud club coach coast code collect college color comfort command comment
commit company compare complete computer concern conduct confirm connect
consider consist contain continue contract control cook copy corner correct
cost count country course court cousin cover crash crawl create creed crisis
cross crowd cry cup cure cycle dance dare date day deal debate decade decide
declare deed define degree deliver demand deny depend describe desert design
desk destroy detect determine develop device diagnosis die direct direction
echo going this
discuss disease distance disturb divide doctor dog dollar door dose doubt
drag dream dress drive drop drum dry during duty eager earn economics edge
edit effect effort elect element emphasis employ empty encourage end enemy
energy engage engine enjoy enter equal escape establish evening event
everything examine example exceed exchange excuse exercise exist expand
expect expense
experiment explain explore export expose express extend face fact factory
fail fair faith family fancy farm farmer fashion father favor fear feed
feel feeling ferry field fight figure file fill film finish fire firm fish
fit fix flash flip float flood floor flourish flow flower fly fold follow
force forest forget form foster free freeze fresh friend fry fund gain game
garden gas gate gather gaze girl give glance glass go goal govern grab grade
grant graph grasp greed grin guard guess guest guide hand handle hang happen
harm hate hatred head headquarters heal heat height help hero hill hold
honor hope horse hospital host hotel hour house hug hundred hunt hurry
hypothesis ice identify ignore imagine impact import impress improve include
increase indeed indicate industry inform insist install instruct intend
interest interview invent invest invite involve island issue item job jog
join judge jump justify keep key kick kill king kiss kitchen knife knit know
lamp land last laugh launch law lawyer lead leader lean learn leave lens
lesson letter level lie lift light like limit line link lion list listen
live load loan locate lock long look love machine mail main manage map march
mark market marry match material mathematics matter measure meet meeting
member mention metal mind minute miss mission mix model modify moment money
month moon morning mother mount mountain mouse move movie multiply murder
muscle music naked name nation nature need neighbor nerve news night nod
noise nose note nothing notice notify novel nurse object observe obtain
occupy occur ocean offer office open operate oppose order organize oven own
pack page paint painting palace paper parent park part party pass past pat
path patrol pattern pause pay peace pencil perform perhaps permit phone
photo phrase physics picture piece pilot pin place plan plant play please
plug poem point police policy politics pop port position potato pour power
practice predict prefer prepare present press prevent price prince princess
print problem proceed process produce product profit progress project
promise promote propose protect protest prove provide publish pull pump
punch punish purchase purpose push qualify queen query question quiz rain
raise range rank rate reach read reader realize reason receive recognize
record recruit reduce refer reflect reform refuse region regret relate
relax release rely remain remark remember remind remove rent repair repeat
replace reply report request require rescue reserve resolve resource
respect respond response rest result retire return review reward rhythm
risk river road roar rock role roll roof room rope rose route rub rule run
rush sacred sail sale salt sand satisfy save scan scarf schedule school
science scissors score scream screen sea seal search season seat section
seed seek seem select sell sense sentence separate series serve service
settle shade shadow shape share shave sheet shelf shift ship shoe shop
shout show sign signal simplify sing singer sister site size skill skip
slam sleep slip smile smoke snap snow soil soldier solve something song
sometimes sort sound source space speak species specify speed spell spend
spin spirit split sport spot spread spring square stage stair stamp stand
star stare start state station stay steam step sterling stick stir stone
stop store storm story stream street strengthen stress stretch strike
string struggle student study subject submit succeed suffer suggest suit
summer supply support suppose surprise survive sustain swim switch system
table tag tap target task taste tax teach teacher team tell temple tend
term test testify thank theory thesis thief thing threaten thus ticket tie
tiger time tip title tomato tool tooth top touch tour tower town track
trade train translate trap travel treat tree trim trip trust try turn
twist type uncle unit unite use valley value vanish vary verify video
village visit visitor voice vote wait walk wall want warm warn wash watch
water wave wear wedding week weigh welcome wheel whereas wicked width
window wing winter wish wolf wonder word work worker worry wrap write
writer yard year yell zip
""".split())


def krovetz_lite(word: str) -> str:
    """KStem-style dictionary-first inflectional stemmer.

    Full Krovetz '93 multi-step shape: whole-word lexicon check, then
    plural -> past tense -> progressive, each step testing candidate
    stems against KSTEM_LEXICON (the '+e' candidate FIRST for -ed/-ing,
    exactly the "strip d, then strip e" probe order of Lucene's
    KStemmer) before the spelling heuristics (doubling undo, CVC
    e-restore) decide for out-of-lexicon words. Used identically at
    index and query time so conflation is self-consistent. Remaining
    divergences from dictionary-exact KStem are lexicon-DISAMBIGUATION
    cases (axes->axis|axe) pinned in tests/test_kstem_golden.py.
    """
    w = word
    hit = KSTEM_EXCEPTIONS.get(w)
    if hit is not None:  # direct conflations beat the length guard (men)
        return hit
    n = len(w)
    if n <= 3 or not w.isalpha():
        return w
    if w in KSTEM_LEXICON:
        return w
    # plurals
    if w.endswith("ies") and n > 4:
        cand = w[:-3] + "y"
        if cand in KSTEM_LEXICON:
            return cand
        if w[:-1] in KSTEM_LEXICON:  # movies -> movie
            return w[:-1]
        return cand
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ss") or w.endswith("us"):
        return w
    if w.endswith("es") and n >= 4:
        s1, s2 = w[:-1], w[:-2]
        if s1 in KSTEM_LEXICON:  # houses -> house
            return s1
        if s2 in KSTEM_LEXICON:  # boxes -> box, goes -> go
            return s2
        if n > 4:
            if s2.endswith(("x", "ch", "sh", "z", "s")):
                return s2
            return s1
        return s1
    if w.endswith("s"):
        return w[:-1]
    # past tense
    if w.endswith("ied") and n > 4:
        return w[:-3] + "y"
    if w.endswith("ed") and n > 4:
        stem = w[:-2]
        if w[:-1] in KSTEM_LEXICON:  # noted -> note (strip 'd' only)
            return w[:-1]
        if stem in KSTEM_LEXICON:  # visited -> visit
            return stem
        if len(stem) >= 3 and stem[-1] == stem[-2]:
            if stem[:-1] in KSTEM_LEXICON:  # stopped -> stop, controlled -> control
                return stem[:-1]
            if stem[-1] not in "lszaeiou":
                return stem[:-1]
        return stem + "e" if _wants_e(stem) else stem
    # progressive
    if w.endswith("ing") and n > 5:
        stem = w[:-3]
        if stem + "e" in KSTEM_LEXICON:  # making -> make, caring -> care
            return stem + "e"
        if stem in KSTEM_LEXICON:  # visiting -> visit
            return stem
        if len(stem) >= 3 and stem[-1] == stem[-2]:
            if stem[:-1] in KSTEM_LEXICON:  # running -> run
                return stem[:-1]
            if stem[-1] not in "lszaeiou":
                return stem[:-1]
        return stem + "e" if _wants_e(stem) else stem
    return w


def _wants_e(stem: str) -> bool:
    """Heuristic: restore trailing 'e' (merg -> merge, scor -> score)."""
    if len(stem) < 3:
        return False
    c, v, a = stem[-1], stem[-2], stem[-3]
    if c in "aeiouwxy":
        return False
    # TRUE CVC pattern (scor -> score but read -> read, look -> look:
    # a vowel digraph before the final consonant takes no 'e'), or
    # e-taking finals after a consonant cluster (merg -> merge,
    # danc -> dance, serv -> serve)
    return (v in "aeiou" and a not in "aeiou") or c in "cgvz"


# per-(stop, stem) token -> normalized-form caches. The corpus token
# stream is Zipf-distributed, so after warmup virtually every lookup
# hits (a dict get is ~25x cheaper than re-running krovetz_lite —
# measured 0.21s -> 0.03s per 4000 sf0.1 docs in the build kernel).
# Bounded: past _TOKEN_CACHE_MAX entries new tokens are computed but
# not inserted, so a pathological unbounded vocabulary cannot grow
# executor memory (the Zipf head that matters is cached first anyway).
_TOKEN_CACHE: dict[tuple[bool, bool], dict[str, str]] = {}
_TOKEN_CACHE_MAX = 2_000_000


@dataclass(frozen=True)
class Analyzer:
    """Tokenization config; ``tokens()`` keeps stopword slots as ''."""

    name: str
    stop: bool = False
    stem: bool = False

    def tokens(self, text: str) -> list[str]:
        """Full position-preserving token stream ('' = removed stopword)."""
        if text is None:
            return []
        out = TOKEN_RE.findall(text.lower())
        if self.stop or self.stem:
            cache = _TOKEN_CACHE.setdefault((self.stop, self.stem), {})
            get = cache.get
            for i, t in enumerate(out):
                r = get(t)
                if r is None:
                    if self.stop and t in LUCENE_STOPWORDS:
                        r = ""
                    elif self.stem:
                        r = krovetz_lite(t)
                    else:
                        r = t
                    if len(cache) < _TOKEN_CACHE_MAX:
                        cache[t] = r
                out[i] = r
        return out

    def terms(self, text: str) -> list[str]:
        """Query-side tokenization: stopword slots dropped."""
        return [t for t in self.tokens(text) if t]


ANALYZERS: dict[str, Analyzer] = {
    "simple": Analyzer("simple", stop=False, stem=False),
    "english": Analyzer("english", stop=True, stem=True),
    "english_nostem": Analyzer("english_nostem", stop=True, stem=False),
}


def get_analyzer(name: str) -> Analyzer:
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; have {sorted(ANALYZERS)}")


def analyzer_version(name: str) -> str:
    """Stable fingerprint of an analyzer's behavior-defining tables.

    Persisted in the index manifest so a query session can detect that
    the stemmer/stopword rules changed since the index was written —
    index-time and query-time tokenization MUST agree or term lookups
    silently miss. The hash covers the token regex, the stop set, the
    stemmer rule tables (exception dict) and a rule-code revision tag
    that must be bumped whenever krovetz_lite/_wants_e logic changes.
    """
    import hashlib

    an = get_analyzer(name)
    h = hashlib.md5()
    h.update(b"rules-v3")  # bump on any krovetz_lite/_wants_e code change
    h.update(TOKEN_RE.pattern.encode())
    h.update(repr((an.stop, an.stem)).encode())
    if an.stop:
        h.update(",".join(sorted(LUCENE_STOPWORDS)).encode())
    if an.stem:
        for k in sorted(KSTEM_EXCEPTIONS):
            h.update(f"{k}>{KSTEM_EXCEPTIONS[k]};".encode())
        h.update(",".join(sorted(KSTEM_LEXICON)).encode())
    return h.hexdigest()[:16]


def tokenize_udf(analyzer: str | Analyzer):
    """Arrow-batched pandas UDF: string column -> array<string> token slots.

    Stopword slots come back as '' so positions survive the JVM-side
    ``posexplode``; downstream filters ``token != ''`` before building
    postings. Field length = size(array) — includes stopword positions,
    matching the reference (Idx.java:97).
    """
    an = get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        return texts.map(an.tokens)

    return _tok
