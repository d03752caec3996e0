from searchengine_spark.analyzer import get_analyzer, krovetz_lite


def test_simple_tokens():
    an = get_analyzer("simple")
    assert an.tokens("Near-Death experience, 42!") == ["near", "death", "experience", "42"]
    assert an.terms("") == []
    assert an.tokens(None) == []


def test_english_stopword_slots():
    an = get_analyzer("english")
    toks = an.tokens("the cat and the hats")
    # stopword slots preserved as '' (position space intact)
    assert toks == ["", "cat", "", "", "hat"]
    assert an.terms("the cat and the hats") == ["cat", "hat"]


def test_nostem_variant():
    an = get_analyzer("english_nostem")
    assert an.tokens("the cats") == ["", "cats"]


def test_krovetz_lite_rules():
    assert krovetz_lite("tables") == "table"
    assert krovetz_lite("cities") == "city"
    assert krovetz_lite("merged") == "merge"
    assert krovetz_lite("running") == "run"
    assert krovetz_lite("glass") == "glass"
    assert krovetz_lite("boxes") == "box"
    assert krovetz_lite("is") == "is"
