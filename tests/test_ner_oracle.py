"""Unit tests of gazetteer NER, fuzzy ratios, linking filters (no Spark)."""

from datetime import date

from ocr_processing_pipeline_spark.extractor.ner import (
    GazetteerIndex, link_mentions, person_date_plausible,
    reduce_person_mentions)
from ocr_processing_pipeline_spark.functions.fuzzy import (
    ratio, token_sort_ratio)

PERSONS = [
    {"identifier": 1, "name": "Arthur Hoffmann", "lemma": "Hoffmann",
     "birthyear": "1857", "deathyear": "1927", "roles": ["Bundesrat"],
     "url": "http://hls-dhs-dss.ch/de/articles/1/"},
    {"identifier": 2, "name": "Emil Welti", "lemma": "Welti",
     "birthyear": "1825", "deathyear": "1899", "roles": ["Bundesrat"],
     "url": "http://hls-dhs-dss.ch/de/articles/2/"},
    {"identifier": 3, "name": "Guarded Person", "lemma": "Person",
     "birthyear": "1900", "deathyear": "1980", "roles": [],
     "url": "https://untrusted.example/3"},
    {"identifier": 4, "name": "Badyear Fellow", "lemma": "Fellow",
     "birthyear": "", "deathyear": "18xx", "roles": [],
     "url": "http://hls-dhs-dss.ch/de/articles/4/"},
]
PLACES = [
    {"identifier": "10", "name_de": "Bern", "name_fr": "Berne",
     "name_it": "Berna", "url": "https://ld.admin.ch/m/10"},
    {"identifier": "11", "name_de": "Sankt Gallen", "name_fr": "Saint-Gall",
     "name_it": "San Gallo", "url": "https://ld.admin.ch/m/11"},
]
ORGS = [
    {"name_de": "Eidgenössische Nationalbank", "name_fr": "Banque nationale",
     "name_it": "Banca nazionale",
     "url": "https://culture.ld.admin.ch/sfa/org/1"},
]


def _index():
    return GazetteerIndex(PERSONS, PLACES, ORGS)


def test_fuzzy_ratios():
    assert ratio("Hoffmann", "Hoffmann") == 100
    assert ratio("Hoffmann", "Hofmann") >= 85
    assert ratio("Hoffmann", "Welti") < 50
    assert token_sort_ratio("Hoffmann Arthur", "Arthur Hoffmann") == 100
    assert token_sort_ratio("arthur hoffmann", "Arthur  Hoffmann!") == 100


def test_trie_scan_longest_match():
    idx = _index()
    text = "Gestern sprach Arthur Hoffmann in Sankt Gallen über Bern."
    mentions = {(m["mention"], m["entity_type"]) for m in idx.scan(text)}
    assert ("Arthur Hoffmann", "PER") in mentions
    assert ("Sankt Gallen", "LOC") in mentions
    assert ("Bern", "LOC") in mentions
    # longest match consumed "Sankt Gallen" — no separate "Gallen"
    assert not any(m == ("Gallen", "LOC") for m in mentions)


def test_scan_final_sigma_matches_per_token_path():
    # Final_Sigma: 'ΠΑΤΡΑΣ.Β'.lower() == 'πατρασ.β' (whole-text lowering
    # sees a following cased letter) but the isolated token lowers to
    # 'πατρας' — the form the trie key was normalized with. The lower-once
    # fast path must therefore be skipped whenever Σ is present, or the
    # mention silently stops matching (ADVICE r4).
    places = PLACES + [{"identifier": "12", "name_de": "ΠΑΤΡΑΣ",
                        "name_fr": "Patras", "name_it": "Patrasso",
                        "url": "https://ld.admin.ch/m/12"}]
    idx = GazetteerIndex(PERSONS, places, ORGS)
    text = "Stadt ΠΑΤΡΑΣ.Βericht über Bern."
    mentions = {(m["mention"], m["entity_type"]) for m in idx.scan(text)}
    assert ("ΠΑΤΡΑΣ", "LOC") in mentions
    assert ("Bern", "LOC") in mentions


def test_scan_spans_point_into_text():
    idx = _index()
    text = "Heute kam Emil Welti nach Bern."
    for m in idx.scan(text):
        assert text[m["span_start"]:m["span_end"]] == m["mention"]


def test_reduce_person_mentions():
    out = reduce_person_mentions(
        ["Arthur Hoffmann", "Hoffmann", "Hofmann", "Welti"])
    # singles fuzzy-subsumed by the full name's last token drop out
    assert "Arthur Hoffmann" in out
    assert "Hoffmann" not in out and "Hofmann" not in out
    assert "Welti" in out  # no full name to subsume it
    assert out == sorted(set(out))


def test_date_plausibility():
    p = PERSONS[1]  # Welti died 1899
    assert person_date_plausible(p, date(1900, 1, 1))
    # window anchors on date(deathyear, 1, 1) like the reference:
    # 1899-01-01 + 7300 days = 1918-12-27
    assert person_date_plausible(p, date(1918, 12, 1))
    assert not person_date_plausible(p, date(1919, 12, 1))
    assert not person_date_plausible(p, date(1925, 1, 1))  # >20y after death
    # born < 20y before doc date → implausible
    young = {"birthyear": "1900", "deathyear": "1980"}
    assert not person_date_plausible(young, date(1910, 1, 1))
    assert person_date_plausible(young, date(1930, 1, 1))
    # parse failures pass through (apertus_ner_chunk.py:191-192)
    assert person_date_plausible(PERSONS[3], date(1700, 1, 1))
    assert person_date_plausible(p, None)


def test_linking_url_guard_and_scores():
    idx = _index()
    text = "Arthur Hoffmann traf Guarded Person in Bern."
    mentions = idx.scan(text)
    edges = link_mentions(mentions, idx, date(1910, 5, 1), text)
    by_mention = {e["mention"]: e for e in edges}
    assert by_mention["Arthur Hoffmann"]["predicate"] == "hasSubject"
    assert by_mention["Arthur Hoffmann"]["fuzzy_score"] == 100
    assert by_mention["Bern"]["predicate"] == "hasPlace"
    # untrusted URL prefix must not link (apertus_ner_chunk.py:369)
    assert "Guarded Person" not in by_mention


def test_linking_date_filter():
    idx = _index()
    text = "Emil Welti sprach."
    mentions = idx.scan(text)
    # 1930 is >20y after Welti's death (1899) → dropped
    assert link_mentions(mentions, idx, date(1930, 1, 1), text) == []
    assert len(link_mentions(mentions, idx, date(1900, 1, 1), text)) == 1


def test_role_hint_filter():
    idx = _index()
    text = "Der Jurist Arthur Hoffmann sprach."
    mentions = [m for m in idx.scan(text) if m["entity_type"] == "PER"]
    # chunk hints role "Jurist" but Hoffmann's roles are ["Bundesrat"] → drop
    assert link_mentions(mentions, idx, date(1910, 1, 1), text) == []
    text2 = "Der Bundesrat Arthur Hoffmann sprach."
    mentions2 = [m for m in idx.scan(text2) if m["entity_type"] == "PER"]
    assert len(link_mentions(mentions2, idx, date(1910, 1, 1), text2)) == 1
