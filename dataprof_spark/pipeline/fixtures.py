"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md A1).

Schema is exactly the BASELINE.json input_hint:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Every document belongs to a known mixture class with a designed
expected outcome, so the corpus exercises every gate:

==================  =========================================
class               expected outcome
==================  =========================================
clean_en            keep
pii_en              keep, scrub_counts > 0
too_short           drop: too_short
long_words          drop: mean_word_length
symbol_heavy        drop: symbol_ratio
ellipsis_heavy      drop: ellipsis_ratio
no_stopwords        drop: stopword_ratio
dup_lines           drop: dup_line_fraction
clean_fr/de         keep (stopword gate is en-only)
lang_mismatch       drop: lang_mismatch (en text, claimed fr)
mojibake            drop: garbled_encoding
gibberish           drop: high_perplexity
==================  =========================================

Domains follow a Zipf distribution (heavy-domain skew on purpose, to
exercise salting — FIXTURES.md A1). Everything is seeded; the same
(seed, n) always produces byte-identical rows.
"""

from __future__ import annotations

import datetime as dt
import random

from dataprof_spark import config

_EN_CONTENT = (
    "market analysis shows steady growth across regional sectors this "
    "quarter while supply chains continue recovering from earlier "
    "disruption and consumer demand remains strong despite inflation "
    "pressure on household budgets around major cities"
).split()

_EN_STOP = list(config.STOPWORDS_EN)
# content vocab with every stopword removed — for the no_stopwords class
_EN_NOSTOP = [w for w in _EN_CONTENT if w not in config.STOPWORDS_EN]

_FR_WORDS = (
    "le chat dort dans la maison et les enfants jouent pour que tout "
    "le monde soit content avec une grande joie dans le jardin du "
    "village qui est sur la colline pas loin des montagnes"
).split()

_DE_WORDS = (
    "der hund läuft durch den park und die kinder spielen mit dem "
    "ball auf der wiese während die sonne scheint und ein vogel "
    "singt im baum nicht weit von dem haus für die familie"
).split()

_GIB_SYLLABLES = ["zqx", "jkz", "qxj", "wzq", "xkz", "zjq", "kqz", "xqw"]

CLASSES = (
    "clean_en", "clean_en", "clean_en", "clean_en",  # 4/16 weight
    "pii_en", "pii_en",
    "too_short", "long_words", "symbol_heavy", "ellipsis_heavy",
    "no_stopwords", "dup_lines", "clean_fr", "clean_de",
    "lang_mismatch", "mojibake", "gibberish",
)

EXPECTED_REASON = {
    "clean_en": None,
    "pii_en": None,
    "too_short": "too_short",
    "long_words": "mean_word_length",
    "symbol_heavy": "symbol_ratio",
    "ellipsis_heavy": "ellipsis_ratio",
    "no_stopwords": "stopword_ratio",
    "dup_lines": "dup_line_fraction",
    "clean_fr": None,
    "clean_de": None,
    "lang_mismatch": "lang_mismatch",
    "mojibake": "garbled_encoding",
    "gibberish": "high_perplexity",
}


def _sentence(rng: random.Random, words: list[str], stops: list[str],
              n: int, stop_every: int = 3) -> str:
    out = []
    for i in range(n):
        if stop_every and i % stop_every == 0:
            out.append(rng.choice(stops))
        else:
            out.append(rng.choice(words))
    return " ".join(out)


def _make_text(rng: random.Random, cls: str) -> tuple[str, str]:
    """(text, claimed_lang) for one document of the given class."""
    if cls in ("clean_en", "pii_en"):
        n = rng.randint(40, 150)
        text = _sentence(rng, _EN_CONTENT, _EN_STOP, n)
        if cls == "pii_en":
            bits = [text]
            if rng.random() < 0.9:
                bits.append(
                    f"contact {rng.choice(['ann','bob','kim'])}"
                    f"{rng.randint(1, 99)}@example.com"
                )
            if rng.random() < 0.6:
                bits.append(
                    f"call {rng.randint(200, 999)}-"
                    f"{rng.randint(200, 999)}-{rng.randint(1000, 9999)}"
                )
            if rng.random() < 0.5:
                bits.append(
                    f"server {rng.randint(1, 240)}.{rng.randint(0, 255)}"
                    f".{rng.randint(0, 255)}.{rng.randint(1, 254)}"
                )
            if rng.random() < 0.4:
                bits.append(f"do not say {rng.choice(config.BLOCKLIST_TERMS)}")
            text = " and the ".join(bits)
        return text, "en"
    if cls == "too_short":
        return _sentence(rng, _EN_CONTENT, _EN_STOP, rng.randint(3, 12)), "en"
    if cls == "long_words":
        longs = ["".join(rng.choice(_EN_CONTENT) for _ in range(4))
                 for _ in range(30)]
        return " ".join(longs), "en"
    if cls == "symbol_heavy":
        base = _sentence(rng, _EN_CONTENT, _EN_STOP, 40)
        junk = " ".join("#@$%^&*" for _ in range(20))
        return base + " " + junk, "en"
    if cls == "ellipsis_heavy":
        base = _sentence(rng, _EN_CONTENT, _EN_STOP, 40)
        dots = " ... ".join(rng.choice(_EN_CONTENT) for _ in range(10))
        return base + " " + dots + " ...", "en"
    if cls == "no_stopwords":
        return _sentence(rng, _EN_NOSTOP, _EN_NOSTOP, 60, stop_every=0), "en"
    if cls == "dup_lines":
        line = _sentence(rng, _EN_CONTENT, _EN_STOP, 8)
        uniq = [_sentence(rng, _EN_CONTENT, _EN_STOP, 8) for _ in range(3)]
        lines = [line] * 7 + uniq
        rng.shuffle(lines)
        return "\n".join(lines), "en"
    if cls == "clean_fr":
        return _sentence(rng, _FR_WORDS, _FR_WORDS, rng.randint(40, 120),
                         stop_every=0), "fr"
    if cls == "clean_de":
        return _sentence(rng, _DE_WORDS, _DE_WORDS, rng.randint(40, 120),
                         stop_every=0), "de"
    if cls == "lang_mismatch":
        # fluent English text claiming to be French: heuristic gates all
        # pass (stopword gate is en-only), langid says "en" != "fr".
        return _sentence(rng, _EN_CONTENT, _EN_STOP, rng.randint(40, 120)), "fr"
    if cls == "mojibake":
        base = _sentence(rng, _EN_CONTENT, _EN_STOP, 50)
        words = base.split()
        for _ in range(3):
            words.insert(rng.randrange(len(words)), "cafÃ©")
        return " ".join(words), "en"
    if cls == "gibberish":
        # enough stopwords to pass the stopword gate, but letter
        # distribution far from English → perplexity blows the ceiling.
        toks = []
        for i in range(60):
            if i % 5 == 0:
                toks.append(rng.choice(_EN_STOP))
            else:
                toks.append("".join(rng.choice(_GIB_SYLLABLES)
                                    for _ in range(2)))
        return " ".join(toks), "en"
    raise ValueError(cls)


def generate_pages(
    n: int = 1000, seed: int = config.SEED, n_domains: int = 50
) -> list[dict]:
    """Deterministic list of page rows (input_hint schema + a hidden
    `_class` field for tests; strip it before feeding the pipeline)."""
    rng = random.Random(seed)
    # Zipf-ish domain weights: rank r gets weight 1/(r+1).
    domains = [f"site{d}.example.org" for d in range(n_domains)]
    weights = [1.0 / (d + 1) for d in range(n_domains)]
    base_ts = dt.datetime(2026, 3, 1, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(n):
        cls = CLASSES[i % len(CLASSES)]
        text, lang = _make_text(rng, cls)
        domain = rng.choices(domains, weights=weights, k=1)[0]
        r = rng.random()
        if r < 0.03:
            ts = base_ts + dt.timedelta(days=365 + i % 30)   # future
        elif r < 0.08:
            ts = base_ts - dt.timedelta(days=6 * 365 + i % 200)  # stale
        elif r < 0.13:
            ts = None  # missing crawl timestamp: timeliness unassessed
        else:
            ts = base_ts + dt.timedelta(hours=i % (24 * 28))
        rows.append(
            {
                "url": f"https://{domain}/page/{i}",
                "warc_ts": ts,
                "html": b"<html><body>" + text.encode("utf-8")
                + b"</body></html>",
                "text": text,
                "lang": lang,
                "_class": cls,
            }
        )
    return rows


def inject_duplicates(
    rows: list[dict],
    seed: int = config.SEED,
    exact_frac: float = 0.05,
    near_frac: float = 0.03,
) -> list[dict]:
    """Deterministically append exact- and near-duplicate copies of
    kept-class documents so the phase-2 demotion stages have real work
    (a web corpus is full of boilerplate repeats; a dup-free bench
    corpus times the demotion joins on empty loser sets).

    - exact copies: byte-identical text under a strictly larger url
      (``?dup=j`` suffix), so the ORIGINAL is always the canonical
      (min-url) member and every copy is a deterministic loser.
    - near copies: one mid-document word perturbed, which disturbs at
      most SHINGLE_K word-3-shingles of a 40+-word doc — shingle
      Jaccard stays well above the 0.7 verify threshold, so the copy
      is a guaranteed near-dup candidate AND verified pair.

    Appended rows carry ``_class`` 'exact_dup_copy'/'near_dup_copy';
    the result is shuffled (seeded) so duplicates spread across file
    splits rather than clustering in the tail partitions."""
    rng = random.Random(seed ^ 0x5EED)
    keepers = [
        r for r in rows if EXPECTED_REASON.get(r["_class"]) is None
    ]
    if not keepers:
        return list(rows)
    out = list(rows)
    for j in range(int(len(rows) * exact_frac)):
        src = keepers[rng.randrange(len(keepers))]
        out.append(
            {**src, "url": src["url"] + f"?dup={j}",
             "_class": "exact_dup_copy"}
        )
    for j in range(int(len(rows) * near_frac)):
        src = keepers[rng.randrange(len(keepers))]
        words = src["text"].split()
        if len(words) > 10:
            k = rng.randrange(3, len(words) - 3)
            words[k] = words[k] + "x"
        ntext = " ".join(words)
        out.append(
            {**src, "url": src["url"] + f"?near={j}", "text": ntext,
             "html": b"<html><body>" + ntext.encode("utf-8")
             + b"</body></html>",
             "_class": "near_dup_copy"}
        )
    rng.shuffle(out)
    return out


def pages_df(spark, rows: list[dict] | None = None, n: int = 1000):
    """Spark DataFrame with the exact input_hint schema."""
    from pyspark.sql import types as T

    rows = rows if rows is not None else generate_pages(n)
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    data = [
        (r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
        for r in rows
    ]
    return spark.createDataFrame(data, schema)
