"""Deterministic synthetic Common-Crawl-style corpus (seed=42, no external data).

Generates the ``pages`` input table exactly per BASELINE.json input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
plus the gazetteer dimension tables (persons/places/orgs) shaped after the
reference's loaders (bio_loader_lora.py:45-63, lindas_*_lora_loader.py:45-57;
see FIXTURES.md §1-2).

Properties exercised on purpose:
- heavily skewed host distribution (one host ≈ 50% of rows) → salting
- ~3% PDF-ish binary payloads (magic + kind/length-prefixed blocks)
- ~1% malformed rows (truncated tags / bad encoding) → failure codes
- boilerplate nav/footer/ads + high-link-density lists around one main
  content region; entity names planted verbatim AND with OCR-style typos
  only inside main content (extraction errors surface as NER diffs)
- de/fr/it/en language mix for routing (F8)

Pure pyarrow writers — usable without a SparkSession (tests, DuckDB oracle).
"""

from __future__ import annotations

import os
import random
import struct
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..extractor.core import PDF_MAGIC

SEED = 42
CORPUS_VERSION = 2   # bump when the grammar changes → caches regenerate

_HOSTS = [
    ("archive.example.ch", 0.50),   # the skewed host
    ("news.example.de", 0.15),
    ("journal.example.fr", 0.12),
    ("gazzetta.example.it", 0.10),
    ("blog.example.com", 0.08),
    ("docs.example.org", 0.05),
]

_LANG_BY_HOST = {
    "archive.example.ch": ["de", "de", "fr", "it"],
    "news.example.de": ["de"],
    "journal.example.fr": ["fr"],
    "gazzetta.example.it": ["it"],
    "blog.example.com": ["en"],
    "docs.example.org": ["en", "de"],
}

_WORDS = {
    "de": ("der bundesrat beschliesst die sitzung über das protokoll und "
           "verhandlung im departement eine vorlage wird nach bern geführt "
           "sowie kanton gemeinde verwaltung bericht antrag gesetz artikel "
           "behörde entscheid sitzungen jahr franken budget").split(),
    "fr": ("le conseil décide la séance sur une proposition qui est conduite "
           "vers berne dans les cantons et communes administration rapport "
           "demande loi article autorité décision année francs budget pour "
           "des nouvelles mesures du gouvernement").split(),
    "it": ("il consiglio decide la seduta su una proposta che viene portata "
           "verso berna nei cantoni e comuni amministrazione rapporto "
           "domanda legge articolo autorità decisione anno franchi per le "
           "nuove misure del governo della confederazione").split(),
    "en": ("the council decides a session on this proposal which is brought "
           "to bern in the cantons and municipalities administration report "
           "request law article authority decision year francs budget for "
           "new measures of the government").split(),
}

_FIRST = ("Arthur Emil Johann Karl Ludwig Ernst Giuseppe Henri Marcel Pierre "
          "Giovanni Felix Eduard Walther Numa Robert Adolf Jean Luigi Marco "
          "Anna Maria Clara Hedwig Rosa Berta Ida Lina Sophie Emma").split()
_LAST = ("Hoffmann Deucher Ruchonnet Welti Schenk Droz Hauser Frey Zemp "
         "Brenner Forrer Comtesse Müller Schulthess Motta Calonder Haab "
         "Chuard Scheurer Musy Pilet Minger Baumann Obrecht Etter Celio "
         "Nobs Escher Weber Kobelt").split()
_PLACE_STEMS = ("Bern Zürich Genf Basel Luzern Lugano Chur Sitten Aarau "
                "Altdorf Schwyz Glarus Zug Freiburg Solothurn Schaffhausen "
                "Herisau Appenzell Gallen Frauenfeld Bellinzona Lausanne "
                "Neuenburg Delsberg Liestal Sarnen Stans").split()
_ORG_STEMS = ("Bundeskanzlei Nationalbank Postverwaltung Zollverwaltung "
              "Eisenbahnen Militärdepartement Finanzdepartement "
              "Justizdepartement Handelsamt Gesundheitsamt Statistikamt "
              "Archivverwaltung").split()
_ROLES = ["Bundesrat", "Jurist", "General", "Direktor", "Professor",
          "Nationalrat", "Ständerat"]


def make_gazetteers(rng: random.Random, n_persons=500, n_places=300,
                    n_orgs=100):
    persons, places, orgs = [], [], []
    seen = set()
    i = 0
    while len(persons) < n_persons:
        i += 1
        first, last = rng.choice(_FIRST), rng.choice(_LAST)
        name = f"{first} {last}"
        variant = i  # disambiguator for repeated names
        if name in seen:
            name = f"{first} {last}-{_PLACE_STEMS[variant % len(_PLACE_STEMS)]}"
            last = name.split()[-1]
        seen.add(name)
        birth = rng.randint(1790, 1930)
        death = birth + rng.randint(35, 90)
        birthyear = str(birth)
        deathyear = str(death)
        r = rng.random()
        if r < 0.05:
            birthyear = ""                     # unparseable → pass-through
        elif r < 0.10:
            deathyear = f"{death}.0"           # float-style, split('.')[0]
        url = (f"http://hls-dhs-dss.ch/de/articles/{10000 + i}/"
               if rng.random() > 0.1
               else f"https://other.example.org/p/{i}")  # prefix-guard rows
        persons.append({
            "identifier": 10000 + i,
            "name": name,
            "complement": first,
            "lemma": last,
            "description": f"Persönlichkeit Nr. {i}",
            "birthyear": birthyear,
            "deathyear": deathyear,
            "birth_uncertainty": rng.random() < 0.05,
            "death_uncertainty": rng.random() < 0.05,
            "url": url,
            "author": "synth",
            "translator": "",
            "roles": sorted(rng.sample(_ROLES, rng.randint(1, 3))),
        })
    for j in range(n_places):
        stem = _PLACE_STEMS[j % len(_PLACE_STEMS)]
        suffix = "" if j < len(_PLACE_STEMS) else f" {j // len(_PLACE_STEMS)}"
        url = (f"https://ld.admin.ch/municipality/{j}"
               if rng.random() > 0.1 else f"https://elsewhere.example/{j}")
        places.append({
            "identifier": str(2000 + j),
            "name_de": f"{stem}{suffix}",
            "name_fr": f"{stem}{suffix}" if rng.random() < 0.5
            else f"{stem}-les-Bains{suffix}",
            "name_it": f"{stem}{suffix}",
            "type": rng.choice(["Gemeinde", "Kanton", "Distrikt", "Nation"]),
            "valid_from": f"{rng.randint(1848, 1970)}-01-01",
            "url": url,
        })
    for k in range(n_orgs):
        stem = _ORG_STEMS[k % len(_ORG_STEMS)]
        suffix = "" if k < len(_ORG_STEMS) else f" {k // len(_ORG_STEMS)}"
        url = (f"https://culture.ld.admin.ch/sfa/org/{k}"
               if rng.random() > 0.1 else f"https://elsewhere.example/o/{k}")
        orgs.append({
            "name_de": f"Eidgenössische {stem}{suffix}",
            "name_fr": f"Office {stem}{suffix}",
            "name_it": f"Ufficio {stem}{suffix}",
            "type": "Amt",
            "valid_from": f"{rng.randint(1848, 1970)}-01-01",
            "url": url,
        })
    return persons, places, orgs


def _sentence(rng: random.Random, lang: str, entity: str | None = None) -> str:
    words = _WORDS[lang]
    n = rng.randint(6, 18)
    toks = [rng.choice(words) for _ in range(n)]
    if entity is not None:
        pos = rng.randint(1, max(1, len(toks) - 1))
        toks.insert(pos, entity)
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + "."


def _typo(rng: random.Random, name: str) -> str:
    """OCR-style single-char corruption (within fuzzy threshold)."""
    if len(name) < 6:
        return name
    i = rng.randint(1, len(name) - 2)
    subs = {"e": "c", "n": "ri", "m": "rn", "l": "1", "o": "0", "a": "ä"}
    c = name[i].lower()
    rep = subs.get(c, c * 2)
    return name[:i] + rep + name[i + 1:]


def _main_paragraphs(rng, lang, persons, places, orgs):
    paras = []
    for _ in range(rng.randint(2, 6)):
        sents = []
        for _ in range(rng.randint(3, 9)):
            entity = None
            r = rng.random()
            if r < 0.18:
                p = rng.choice(persons)
                entity = p["name"] if rng.random() > 0.2 else p["lemma"]
                if rng.random() < 0.1:
                    entity = _typo(rng, entity)
            elif r < 0.28:
                entity = rng.choice(places)["name_de"]
            elif r < 0.33:
                entity = rng.choice(orgs)["name_de"]
            sents.append(_sentence(rng, lang, entity))
        paras.append(" ".join(sents))
    return paras


def _boilerplate_nav(rng, lang) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>'
        for w in rng.sample(_WORDS[lang], 6)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar(rng, lang) -> str:
    links = " ".join(
        f'<a href="/t/{w}">{w} {w2}</a>'
        for w, w2 in zip(rng.sample(_WORDS[lang], 5),
                         rng.sample(_WORDS[lang], 5))
    )
    return f'<div class="sidebar">{links}</div>'


def _entityify(rng, text: str) -> str:
    """Sprinkle HTML entities into body text (convert_charrefs coverage)."""
    words = text.split(" ")
    if len(words) > 4 and rng.random() < 0.5:
        i = rng.randint(1, len(words) - 2)
        words[i] = words[i] + " &amp; " + rng.choice(
            ["M&uuml;ller", "Caf&eacute;", "&quot;zit&quot;"])
    return " ".join(words)


def _content_table(rng, lang) -> str:
    cells = []
    for _ in range(rng.randint(2, 4)):
        row = "".join(
            f"<td>{_sentence(rng, lang)}</td>" for _ in range(2))
        cells.append(f"<tr>{row}</tr>")
    return "<table>" + "".join(cells) + "</table>"


def _render_html(rng, lang, title, paras) -> str:
    blocks = []
    for p in paras:
        blocks.append(f"<p>{_entityify(rng, p)}</p>")
    if rng.random() < 0.25:
        blocks.append(_content_table(rng, lang))
    if rng.random() < 0.15:
        blocks.append(f"<pre>{_sentence(rng, lang)}\n"
                      f"{_sentence(rng, lang)}</pre>")
    body = "".join(blocks)
    ad = '<div class="ad"><a href="http://ads.example/x">buy now</a></div>'
    comment = f"<!-- layout v{rng.randint(1, 9)}: do not index -->"
    return (
        "<!DOCTYPE html><html><head><title>" + title + "</title>"
        "<script>var x=1;</script><style>p{color:#000}</style></head>"
        "<body>" + comment + _boilerplate_nav(rng, lang)
        + _sidebar(rng, lang) + ad +
        f"<article><h1>{title}</h1>{body}</article>" +
        _sidebar(rng, lang) +
        "<footer><a href='/impressum'>impressum</a> · "
        "<a href='/contact'>contact</a></footer></body></html>"
    )


def _render_pdf(rng, lang, title, paras) -> bytes:
    out = bytearray(PDF_MAGIC)

    def rec(kind: int, text: str):
        b = text.encode("utf-8")
        out.append(kind)
        out.extend(struct.pack(">I", len(b)))
        out.extend(b)

    rec(1, f"{title} — page header")       # layout boilerplate
    rec(0, title)
    for p in paras:
        rec(0, p)
    rec(1, "page 1 / confidential")
    out.append(0)
    out.extend(struct.pack(">I", 0))       # terminator
    return bytes(out)


def make_pages(n_rows: int, seed: int = SEED,
               gazetteers=None) -> tuple[list[dict], tuple]:
    rng = random.Random(seed)
    if gazetteers is None:
        gazetteers = make_gazetteers(random.Random(seed + 1))
    persons, places, orgs = gazetteers
    host_names = [h for h, _ in _HOSTS]
    host_weights = [w for _, w in _HOSTS]
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n_rows):
        host = rng.choices(host_names, weights=host_weights, k=1)[0]
        lang = rng.choice(_LANG_BY_HOST[host])
        url = f"https://{host}/{lang}/doc/{i:08d}"
        warc_ts = t0 + timedelta(seconds=rng.randint(0, 365 * 24 * 3600))
        title = _sentence(rng, lang).rstrip(".")
        paras = _main_paragraphs(rng, lang, persons, places, orgs)
        r = rng.random()
        pre_text = ""
        if r < 0.03:                                   # PDF-ish payload
            html = _render_pdf(rng, lang, title, paras)
        elif r < 0.035:                                # truncated html
            full = _render_html(rng, lang, title, paras)
            html = full[: len(full) // 3].encode("utf-8")
        elif r < 0.04:                                 # bad encoding
            html = (_render_html(rng, lang, title, paras)
                    .encode("utf-8")[:-40] + b"\xff\xfe\xfa garbled")
        elif r < 0.045:                                # no html, pre-text only
            html = b""
            pre_text = " ".join(paras)
        else:
            html = _render_html(rng, lang, title, paras).encode("utf-8")
        rows.append({"url": url, "warc_ts": warc_ts, "html": html,
                     "text": pre_text, "lang": lang})
    return rows, gazetteers


# --- parquet writers ---------------------------------------------------------

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us", tz="UTC")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def write_corpus(out_dir: str, n_rows: int, seed: int = SEED,
                 shards: int = 1) -> dict:
    """Write pages + gazetteer parquet files; returns path dict.

    ``shards > 1`` writes pages.parquet as a DIRECTORY of part files —
    the realistic Common-Crawl shape (thousands of WARC-derived files),
    giving the scan natural splits so narrow stages parallelize without
    a repartition shuffle.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows, (persons, places, orgs) = make_pages(n_rows, seed=seed)
    paths = {}

    paths["pages"] = os.path.join(out_dir, "pages.parquet")
    if shards <= 1:
        pages_tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
        pq.write_table(pages_tbl, paths["pages"])
    else:
        os.makedirs(paths["pages"], exist_ok=True)
        per = (len(rows) + shards - 1) // shards
        for s in range(shards):
            chunk = rows[s * per:(s + 1) * per]
            if not chunk:
                break
            tbl = pa.Table.from_pylist(chunk, schema=PAGES_SCHEMA)
            pq.write_table(
                tbl, os.path.join(paths["pages"], f"part-{s:05d}.parquet"))

    for name, data in (("persons", persons), ("places", places),
                       ("orgs", orgs)):
        tbl = pa.Table.from_pylist(data)
        paths[name] = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, paths[name])
    return paths


def ensure_corpus(out_dir: str, n_rows: int, seed: int = SEED,
                  shards: int = 1) -> dict:
    """Idempotent write_corpus — reuses files if already generated."""
    marker = os.path.join(
        out_dir, f".complete-v{CORPUS_VERSION}-{n_rows}-{seed}-{shards}")
    names = ("pages", "persons", "places", "orgs")
    paths = {n: os.path.join(out_dir, f"{n}.parquet") for n in names}
    if os.path.exists(marker) and all(os.path.exists(p)
                                      for p in paths.values()):
        return paths
    paths = write_corpus(out_dir, n_rows, seed=seed, shards=shards)
    with open(marker, "w") as f:
        f.write("ok\n")
    return paths


__all__ = ["make_pages", "make_gazetteers", "write_corpus", "ensure_corpus",
           "PAGES_SCHEMA", "SEED"]
