"""Golden KStem fidelity test (VERDICT r2 item 3, extended r4 to 1k+ pairs).

KStem input->output pairs (public algorithm: Krovetz '93, "Viewing
morphology as an inference process"; behavior as shipped in Lucene's
KStemmer / the reference's `english` analyzer chain, QryParser.java:
45-51). `krovetz_lite` implements the full dictionary-first multi-step
algorithm over the embedded KSTEM_LEXICON head dictionary; the GOLDEN
table below — >=1,000 pairs generated from an authored base-word
morphology table plus irregular/identity sets — must reproduce every
pair exactly. Words whose real-KStem output depends on lexicon
DISAMBIGUATION we cannot replicate (axes -> axis|axe) are pinned in
DIVERGES with the current output and a rationale — the list is the
documented fidelity gap, and any unintended behavior change trips it.

Also proves the DuckDB oracle CASE (gate._kstem_sql) replays
krovetz_lite byte-for-byte over every word in all tables plus a fuzz
sample — the CLAUDE.md tokenization invariant.
"""

import duckdb
import pytest

from searchengine_spark.analyzer import (
    KSTEM_EXCEPTIONS,
    KSTEM_LEXICON,
    krovetz_lite,
)
from searchengine_spark.gate import _kstem_sql

# ---------------------------------------------------------------------------
# Base-word morphology tables. The GOLDEN pairs are generated FORWARD
# (base -> correctly spelled English inflections) so the expected
# conflation (inflection -> base) is right by construction for these
# regular, in-lexicon words — exactly the class real KStem resolves via
# its dictionary. Classes: 'p' plain, 'e' silent-e final, 'd' final
# consonant doubles, 'y' consonant+y final, 'es' o/s-final +es plural.
# ---------------------------------------------------------------------------

E_VERBS = """create move serve merge dance score hope note change charge close
compare complete continue declare define describe determine divide encourage
engage escape examine exchange excuse expose face file force gaze glance guide
handle hate ignore imagine improve include indicate involve judge like locate
love manage measure notice observe operate oppose organize phrase
picture place please practice prepare produce promise propose provide
purchase
raise realize receive recognize reduce refuse relate release remove replace
require rescue reserve resolve retire save schedule separate settle share
shave smile smoke solve stare state store struggle suppose survive taste trade
translate type value vote wave welcome breathe cause base case unite invite
promote prove cite cure date dare figure cycle issue pause route argue achieve
believe challenge arrange arrive advance balance bottle""".split()

D_VERBS = """stop plan drop grab ship shop chat clap drag drum flip grin hug
jog knit nod pat pin plug pop rub scan skip slam slip snap spot step stir tag
tap trap trim trip wrap zip admit commit permit submit regret occur refer
prefer control patrol""".split()

# irregular pasts -> only -s and -ing forms
SI_VERBS = """run swim spin begin split""".split()

Y_VERBS = """carry marry study try cry dry fry apply supply reply deny rely
vary copy envy worry hurry empty fancy identify justify modify notify occupy
qualify satisfy simplify specify verify classify multiply testify ferry""".split()

P_VERBS = """walk jump look seem train clean treat ask work call turn help
talk start play show open follow offer remember consider appear wait attack
attend avoid report explain develop suggest remain happen listen cover reach
touch finish publish punish vanish accomplish establish flourish act add aid
aim alarm alert allow answer arrest assist attempt award back bank blast boil
bomb book boost borrow brand burn claim climb coach collect comfort command
comment conduct confirm connect consist contain correct count crash crawl
cross crowd deliver demand depend design destroy detect direct discuss
disturb earn edit elect employ end enjoy enter exist expand expect experiment
export express extend fail fear fill fix flash float flood flow fold form
gain gather govern guess hand harm head heat host hunt impact import impress
inform insist install instruct intend interview invent invest join kick kill
land last laugh launch lean learn lift limit link list load lock mark match
mind mix mount murder object obtain order own pack park perform pick plant
point predict present prevent print process protect protest pull pump punch
push rain rank reason record recruit reflect reform relax remark remind rent
repair repeat request respect respond rest result return review reward risk
roar rock roll rush sail scream seal season select shift shout sign signal
sound spell stay steam storm stream strengthen stress stretch subject suffer
suit support suspect sustain switch target test thank threaten track trust
twist visit want warm warn wash watch wish yell pass press miss kiss
mention talk burn pick suspect""".split()

# -ing form is a lexicalized noun (painting/feeling/... identity below),
# so only -s/-ed are generated for these
P_VERBS_NO_ING = """paint interest""".split()

NOUNS = """car door table brick engine system city army body party box church
brush glass tax shoe page house cave game book tree road hill star moon river
mountain valley island ocean forest field farm garden flower plant animal
bird horse cat dog lion tiger bear school student teacher lesson paper pencil
computer phone screen window wall floor roof room kitchen chair desk lamp
clock camera picture photo video song letter word sentence story novel poem
writer reader doctor nurse lawyer farmer worker player singer actor artist
driver pilot soldier king queen prince princess leader member friend family
parent baby boy girl uncle aunt cousin neighbor guest visitor enemy country
nation state region area town village street bridge tower castle palace
temple market store hotel hospital station airport port factory office
company industry product service price cost profit dollar bank account card
ticket contract deal job career skill goal project task duty role rule law
right power energy source resource material metal stone rock sand bone boat
chain cell club coast code college court cup debate decade degree desert
device dream dress effect effort element event example fact faith fashion
father mother sister film fund gate grade graph hero potato tomato echo
movie key item unit theory title tool tour path pattern peace piece policy
position problem question range rate rhythm rope salt seat sheet site size
space spirit sport square stage stamp stair term time tip wheel width wing
yard year machine mail model muscle music name nature nerve night noise
oven""".split()

ES_NOUNS = """hero potato tomato echo bus""".split()

# real KStem lexicon words returned unchanged (rules would mangle them)
IDENTITY = """news series species analysis basis crisis thesis hypothesis
emphasis diagnosis physics mathematics economics politics during morning
evening nothing something anything everything string spring sterling hundred
indeed speed feed need seed deed exceed proceed succeed breed bleed creed
greed wicked hatred sacred naked lens chaos bias alias canvas atlas this
always perhaps besides whereas sometimes clothes scissors headquarters
meeting building feeling wedding ceiling clothing painting being going
business campus census virus class press was its king sing thing ring red
bed""".split()


def _plural(base: str, cls: str) -> str:
    if cls == "y":
        return base[:-1] + "ies"
    if cls == "es" or base.endswith(("s", "x", "z", "ch", "sh")):
        return base + "es"
    return base + "s"


def _past(base: str, cls: str) -> str:
    if cls == "y":
        return base[:-1] + "ied"
    if cls == "e":
        return base + "d"
    if cls == "d":
        return base + base[-1] + "ed"
    return base + "ed"


def _gerund(base: str, cls: str) -> str:
    if cls == "e":
        return base[:-1] + "ing"
    if cls == "d":
        return base + base[-1] + "ing"
    return base + "ing"


def _build_golden() -> dict:
    golden: dict[str, str] = {}
    for base in E_VERBS:
        golden[_plural(base, "e")] = base
        golden[_past(base, "e")] = base
        golden[_gerund(base, "e")] = base
    for base in D_VERBS:
        golden[_plural(base, "d")] = base
        golden[_past(base, "d")] = base
        golden[_gerund(base, "d")] = base
    for base in SI_VERBS:
        golden[_plural(base, "d")] = base
        golden[_gerund(base, "d")] = base
    for base in Y_VERBS:
        golden[_plural(base, "y")] = base
        golden[_past(base, "y")] = base
        golden[_gerund(base, "y")] = base
    for base in P_VERBS:
        golden[_plural(base, "p")] = base
        golden[_past(base, "p")] = base
        golden[_gerund(base, "p")] = base
    for base in P_VERBS_NO_ING:
        golden[_plural(base, "p")] = base
        golden[_past(base, "p")] = base
    for base in NOUNS:
        golden[_plural(base, "p")] = base
    for base in ES_NOUNS:
        golden[_plural(base, "es")] = base
    for w in IDENTITY:
        golden[w] = w
    # every direct conflation is itself a golden pair
    golden.update(KSTEM_EXCEPTIONS)
    # length-guard / doubly-irregular extras the generator skips
    golden.update({
        "uses": "use", "dies": "die", "ties": "tie", "lies": "lie",
        "goes": "go", "agreed": "agree", "agrees": "agree",
        "agreeing": "agree", "freed": "free", "frees": "free",
        "freeing": "free", "seeing": "see", "reading": "read",
        "heroes": "hero", "quizzes": "quiz",
    })
    return golden


GOLDEN = _build_golden()

# Real KStem resolves these through lexicon DISAMBIGUATION (several
# dictionary entries compete) that a head lexicon cannot replicate; the
# current output is pinned ON PURPOSE so any drift is visible. Each
# entry: word -> (our output, what dictionary-exact KStem would need).
DIVERGES = {
    "axes": ("axe", "KStem disambiguates to 'axis' via lexicon entry priority"),
    "lives": ("live", "noun reading 'life' vs verb 'live' — needs sense-ranked lexicon"),
    "leaves": ("leave", "noun reading 'leaf' vs verb 'leave' — same"),
    "does": ("doe", "verb reading 'do' vs noun 'doe' — same"),
    "training": ("train", "KStemData may lexicalize the noun 'training' (identity)"),
}


def test_golden_pairs():
    assert len(GOLDEN) >= 1000, f"only {len(GOLDEN)} golden pairs"
    bad = {w: (krovetz_lite(w), want) for w, want in GOLDEN.items()
           if krovetz_lite(w) != want}
    assert not bad, f"{len(bad)} golden KStem pairs broken: {dict(list(bad.items())[:25])}"


def test_all_bases_in_lexicon():
    """The generated conflations rely on the dictionary-first lookups —
    every base word must be a lexicon entry (single source of truth)."""
    bases = set(
        E_VERBS + D_VERBS + SI_VERBS + Y_VERBS + P_VERBS + P_VERBS_NO_ING
        + NOUNS + ES_NOUNS + IDENTITY
    )
    missing = sorted(b for b in bases if len(b) > 3 and b not in KSTEM_LEXICON)
    assert not missing, f"bases missing from KSTEM_LEXICON: {missing}"


def test_pinned_divergences():
    for w, (out, _why) in DIVERGES.items():
        assert krovetz_lite(w) == out, (
            f"pinned divergence for {w!r} drifted: "
            f"{krovetz_lite(w)!r} != {out!r}"
        )


def test_dictionary_first():
    # lexicon/conflation entries must win over the suffix rules
    assert krovetz_lite("news") == "news"          # -s rule would strip
    assert krovetz_lite("agreed") == "agree"       # heuristic would give 'agre'
    assert krovetz_lite("movies") == "movie"       # -ies rule would give 'movy'
    assert krovetz_lite("women") == "woman"        # irregular plural
    assert krovetz_lite("controlled") == "control" # 'l' excluded from heuristic undo
    # and stay inert for non-alpha / short tokens
    assert krovetz_lite("new5") == "new5"
    assert krovetz_lite("was") == "was"


def _oracle_words() -> list[str]:
    words = sorted(set(GOLDEN) | set(DIVERGES) | set(KSTEM_EXCEPTIONS)
                   | set(KSTEM_LEXICON))
    fuzz = [
        b + s for b in ("tab", "merg", "cross", "buzz", "roll", "carr",
                        "fre", "spe", "gl", "xy", "danc", "stud", "visit",
                        "controll", "qui")
        for s in ("", "s", "es", "ies", "ed", "ied", "ing", "ss", "us", "sses")
    ]
    return words + fuzz


@pytest.mark.parametrize("chunk", [0, 1])
def test_oracle_sql_replays_stemmer_exactly(chunk):
    """DuckDB scalar CASE == python krovetz_lite for every golden/pinned
    word plus suffix-heavy fuzz — the tokenization invariant (CLAUDE.md)."""
    words = _oracle_words()[chunk::2]
    con = duckdb.connect()
    sql = _kstem_sql("w")
    got = con.execute(
        f"SELECT w, {sql} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    bad = [(w, sq, krovetz_lite(w)) for w, sq in got if sq != krovetz_lite(w)]
    assert not bad, f"{len(bad)} oracle/stemmer mismatches: {bad[:20]}"


def test_join_oracle_replays_stemmer_exactly():
    """The hash-join stem map (gate.kstem_map_ctes — what the corpus
    gate oracle actually executes) == python krovetz_lite over the same
    word set, with stopwords mapped to '' position slots."""
    from searchengine_spark.analyzer import LUCENE_STOPWORDS
    from searchengine_spark.gate import kstem_map_ctes

    words = _oracle_words()
    con = duckdb.connect()
    got = con.execute(
        f"WITH vocab AS (SELECT unnest(?) AS w), {kstem_map_ctes('vocab')} "
        f"SELECT w, kt FROM kstems",
        [words],
    ).fetchall()

    def expect(w: str) -> str:
        return "" if w in LUCENE_STOPWORDS else krovetz_lite(w)

    bad = [(w, kt, expect(w)) for w, kt in got if kt != expect(w)]
    assert not bad, f"{len(bad)} join-oracle/stemmer mismatches: {bad[:20]}"
