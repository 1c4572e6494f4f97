"""Deterministic synthetic web-page corpus with planted duplicate structure.

Input shape per BASELINE.json ``input_hint``: ``(url string, warc_ts
timestamp, html binary, text string, lang string)``. The planted-cluster
design transposes the reference's functional fixture corpus — 7 planted
duplicates across sources + hard negatives + one non-deduplicable record
(/root/reference/test/functional/dataset/duplicatesFixtures.js,
notDuplicatesFixtures.js:1612) — onto web pages (FIXTURES.md §1).

Every page is a pure function of ``(seed, index)`` — generation runs
distributed via ``mapInPandas`` over ``spark.range`` and is invariant to
partitioning, which is what makes goldens reproducible at any scale.

Block layout (one block = 100 docs, index i → block ``i//100``, slot ``i%100``):

  slots  0-2   exact-copy group            (tier-1 "1ID" analogue)
  slots  3-5   normalizer-variant group    (case/punct/accent edits only)
  slots  6-9   transitive chain of 4       (adjacent J≥0.8, ends J<0.8)
  slots 10-11  near-dup pair               (3 token edits)
  slot  12     substring container of 13   (engine-3 golden, not a MinHash dup)
  slot  13     contained page
  slots 14-15  hard-negative pair          (same boilerplate, disjoint content)
  slot  16     session-2 recrawl of slot 0 (joins the exact group)
  slot  17     degenerate page             (empty text → non-deduplicable)
  slots 18-99  unique singletons
"""

from __future__ import annotations

import html as html_mod
import random
import re
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOCK = 100
_HOSTS = ["crawl-a", "crawl-b", "crawl-c"]

_VOCAB_EN = (
    "data spark cluster shuffle partition query join filter aggregate window "
    "table column schema parquet stream batch driver executor task stage hash "
    "sort merge scan broadcast skew salt band signature shingle token text page "
    "crawl index store read write commit snapshot branch merge plan optimize "
    "cost rule catalog lake house vector embed model train corpus sample label "
    "graph edge node component chain source session record field value key"
).split()

_VOCAB_FR = (
    "donnée grappe mélange partition requête jointure filtre fenêtre table "
    "colonne schéma flux lot pilote exécuteur tâche étape tri fusion balayage "
    "diffusion déséquilibre bande signature jeton texte page index lecture "
    "écriture validation instantané branche plan optimiseur coût règle "
    "catalogue vecteur modèle corpus étiquette graphe arête nœud composant "
    "chaîne source session champ valeur clé résultat début voilà déjà créé"
).split()

_SESSION1 = datetime(2024, 1, 1)
_SESSION2 = datetime(2024, 6, 1)

SESSION1_NAME = "crawl-2024-01"
SESSION2_NAME = "crawl-2024-06"

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


def _vocab(block: int) -> tuple[list[str], str]:
    return (_VOCAB_FR, "fr") if block % 7 == 3 else (_VOCAB_EN, "en")


def _base_tokens(seed: int, block: int, group: str, n: int = 150) -> list[str]:
    rng = random.Random(f"{seed}:base:{block}:{group}")
    vocab, _ = _vocab(block)
    return [vocab[rng.randrange(len(vocab))] for _ in range(n)]


def _edit_tokens(tokens: list[str], n_edits: int, rng: random.Random, vocab: list[str]) -> list[str]:
    out = list(tokens)
    for _ in range(n_edits):
        out[rng.randrange(len(out))] = vocab[rng.randrange(len(vocab))]
    return out


def _style_variant(tokens: list[str], rng: random.Random) -> list[str]:
    """Case/punctuation/accent edits that the F1 normalizer must erase
    (reference normalizer semantics, /root/reference/README.md:41-45)."""
    out = []
    for t in tokens:
        r = rng.random()
        if r < 0.15:
            t = t.upper()
        elif r < 0.30:
            t = t.capitalize()
        elif r < 0.40:
            t = t + ","
        elif r < 0.45:
            t = t.replace("a", "à").replace("e", "é") or t
        out.append(t)
    return out


def _to_text(tokens: list[str]) -> str:
    paras = [" ".join(tokens[i : i + 40]) for i in range(0, len(tokens), 40)]
    return "\n\n".join(paras)


def _url(block: int, slot: int) -> str:
    host = _HOSTS[(block + slot) % len(_HOSTS)]
    return f"https://{host}.example.org/p/{block:06d}/{slot:02d}"


def _page_text(seed: int, i: int) -> tuple[str, str, str]:
    """(text, lang, session) for global index i — the pure kernel."""
    block, slot = divmod(i, BLOCK)
    vocab, lang = _vocab(block)
    rng = random.Random(f"{seed}:doc:{block}:{slot}")
    session = SESSION1_NAME
    if slot <= 2:
        toks = _base_tokens(seed, block, "A")
    elif slot <= 5:
        base = _base_tokens(seed, block, "B")
        toks = base if slot == 3 else _style_variant(base, rng)
    elif slot <= 9:
        toks = _base_tokens(seed, block, "C")
        chain_rng = random.Random(f"{seed}:chain:{block}")
        for _step in range(slot - 6):
            toks = _edit_tokens(toks, 4, chain_rng, vocab)
    elif slot <= 11:
        base = _base_tokens(seed, block, "D")
        toks = base if slot == 10 else _edit_tokens(base, 3, rng, vocab)
    elif slot == 12:
        inner = _base_tokens(seed, block, "S", n=80)
        pre = _base_tokens(seed, block, "Spre", n=60)
        post = _base_tokens(seed, block, "Spost", n=60)
        toks = pre + inner + post
    elif slot == 13:
        toks = _base_tokens(seed, block, "S", n=80)
    elif slot <= 15:
        shared = _base_tokens(seed, block, "NEGBOILER", n=30)
        own = [vocab[rng.randrange(len(vocab))] for _ in range(120)]
        toks = shared + own
    elif slot == 16:
        toks = _base_tokens(seed, block, "A")
        session = SESSION2_NAME
    elif slot == 17:
        return "", lang, session
    else:
        toks = [vocab[rng.randrange(len(vocab))] for _ in range(150)]
    return _to_text(toks), lang, session


def render_html(text: str, url: str) -> bytes:
    """Wrap extracted text in deterministic boilerplate. Inverse of
    ``extract_text_py`` — byte-identity is asserted per url (input_hint)."""
    paras = "".join(f"<p>{html_mod.escape(p)}</p>" for p in text.split("\n\n")) if text else ""
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html_mod.escape(url)}</title></head><body>"
        "<header><nav>home | about | contact</nav></header>"
        f"<main>{paras}</main>"
        "<footer>© example.org crawl corpus</footer></body></html>"
    )
    return doc.encode("utf-8")


_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.DOTALL)
_P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def extract_text_py(html_bytes: bytes | None) -> str:
    """html → text, byte-identical to the generator's ``text`` column.

    Deterministic, versioned extraction (SURVEY.md §7 step 2): take <main>,
    one paragraph per <p>, unescape entities, join with blank lines.
    """
    if not html_bytes:
        return ""
    m = _MAIN_RE.search(html_bytes)
    if not m:
        return ""
    body = m.group(1).decode("utf-8")
    return "\n\n".join(html_mod.unescape(p) for p in _P_RE.findall(body))


def _gen_partition(iterator):
    for pdf in iterator:
        rows = []
        for seed, i in zip(pdf["seed"], pdf["id"]):
            seed, i = int(seed), int(i)
            block, slot = divmod(i, BLOCK)
            text, lang, session = _page_text(seed, i)
            base_ts = _SESSION2 if session == SESSION2_NAME else _SESSION1
            url = _url(block, slot)
            rows.append(
                {
                    "url": url,
                    "warc_ts": base_ts + timedelta(seconds=i),
                    "html": render_html(text, url),
                    "text": text,
                    "lang": lang,
                }
            )
        yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus: invariant to partition count."""
    base = spark.range(n_docs).withColumn("seed", F.lit(seed))
    if partitions:
        base = base.repartition(partitions, "id")
    return base.mapInPandas(_gen_partition, schema=PAGES_SCHEMA)


def golden_minhash_clusters(n_docs: int) -> list[set[str]]:
    """Expected near-duplicate clusters (size >= 2) for the MinHash engine."""
    clusters = []
    n_blocks = (n_docs + BLOCK - 1) // BLOCK
    for b in range(n_blocks):
        present = lambda s: b * BLOCK + s < n_docs  # noqa: E731
        groups = [
            [s for s in (0, 1, 2, 16) if present(s)],
            [s for s in (3, 4, 5) if present(s)],
            [s for s in (6, 7, 8, 9) if present(s)],
            [s for s in (10, 11) if present(s)],
        ]
        for g in groups:
            if len(g) >= 2:
                clusters.append({_url(b, s) for s in g})
    return clusters


def golden_pairs(n_docs: int) -> set[tuple[str, str]]:
    """All intra-cluster pairs (url_a < url_b) — recall is measured on these."""
    pairs = set()
    for cluster in golden_minhash_clusters(n_docs):
        members = sorted(cluster)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def golden_substring_pairs(n_docs: int) -> set[tuple[str, str]]:
    out = set()
    for b in range((n_docs + BLOCK - 1) // BLOCK):
        if b * BLOCK + 13 < n_docs:
            a, c = sorted((_url(b, 12), _url(b, 13)))
            out.add((a, c))
    return out
