"""Text/tokenization semantic kernel.

Ports:
- tokenize       -> Serial Version/src/parser.c:51-75 (strtok split +
                    lowercase + stopword filter + stem)
- stopwords      -> Serial Version/data/stopwords.txt via utils.c:9-31
- stem_serial    -> Serial Version/src/utils.c:34-37 (identity stub)
- stem_openmp    -> OpenMP Version/src/utils.c:45-141 (suffix stemmer with
                    tech-term special cases)
- token length guard -> Serial Version/src/index.c:71-73 (drop len>100 or
                    empty at add_token time)
- BM25 math      -> Serial Version/src/ranking.c:55-61 (k1=1.5, b=0.75,
                    idf = ln((N - df + 0.5)/(df + 0.5) + 1)); the config.ini
                    k1=1.2 is dead config - code wins.
"""

from __future__ import annotations

import math
import re

# strtok delimiter set (parser.c:55). Any run of these splits; no empties.
TOKEN_DELIMS = " \t\n\r.,;:!?\"()[]{}<>"
# OpenMP adds /-_=+@ and a 3..50 length filter (OpenMP Version/src/parser.c:56-66)
TOKEN_DELIMS_OPENMP = TOKEN_DELIMS + "/-_=+@"

# Serial Version/data/stopwords.txt (5 words)
DEFAULT_STOPWORDS = ("the", "a", "an", "in", "of")

_SPLIT_RE = re.compile("[" + re.escape(TOKEN_DELIMS) + "]+")

# The same class, as a Spark/DuckDB-compatible regex literal, used verbatim
# by functions/textsql.py and __spark_entry__ oracle SQL so both engines
# tokenize identically.
TOKEN_SPLIT_REGEX = r'[ \t\n\r.,;:!?"()\[\]{}<>]+'


def stem_serial(word: str) -> str:
    """Serial stemmer is a no-op stub (utils.c:34-37)."""
    return word


_OPENMP_SPECIAL = {
    "microservice": "microservice", "microservices": "microservice",
    "api": "api", "apis": "api",
    "database": "database", "databases": "database",
    "index": "index", "indices": "index", "indexes": "index",
    "cloud": "cloud", "clouds": "cloud",
    "container": "container", "containers": "container",
}


def stem_openmp(word: str) -> str:
    """OpenMP Version/src/utils.c:45-141 suffix stemmer."""
    if word is None:
        return word
    w = word[:255]
    n = len(w)
    if n <= 2:
        return w
    special = _OPENMP_SPECIAL.get(w)
    if special is not None:
        return special
    if w[-1] == "s":
        if n > 3 and w[-3] == "i" and w[-2] == "e":
            return w[:-3] + "y"  # -ies -> -y
        if w[-2] == "e":
            # keep the 'e' after s/x/z/ch/sh: strip only the 's'
            if n > 3 and (w[-3] in "sxz"
                          or (n > 4 and w[-4] == "c" and w[-3] == "h")
                          or (n > 4 and w[-4] == "s" and w[-3] == "h")):
                return w[:-1]
            return w[:-2]  # regular -es
        return w[:-1]  # plain plural
    return w


def tokenize(text: str, stopwords=DEFAULT_STOPWORDS, stem=stem_serial,
             max_token_len: int = 100) -> list[str]:
    """parser.c:51-75 pipeline: split on delimiters, ASCII-lowercase,
    drop stopwords, stem, drop empty/over-long tokens (index.c:71-73)."""
    if not text:
        return []
    sw = set(stopwords)
    out = []
    for tok in _SPLIT_RE.split(text):
        if not tok:
            continue
        tok = tok.lower()
        if tok in sw:
            continue
        tok = stem(tok)
        if not tok or len(tok) > max_token_len:
            continue
        out.append(tok)
    return out


# ---- BM25 (ranking.c:55-61) -------------------------------------------------

BM25_K1 = 1.5
BM25_B = 0.75


def bm25_idf(total_docs: int, df: int) -> float:
    return math.log((total_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: int, dl: float, avg_dl: float, idf: float,
                    k1: float = BM25_K1, b: float = BM25_B) -> float:
    return idf * ((tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avg_dl)))


def rank_bm25(postings: dict[str, dict[int, int]], doc_lengths: dict[int, int],
              total_docs: int, query: str, top_k: int = 10,
              stopwords=DEFAULT_STOPWORDS, stem=stem_serial) -> list[tuple[int, float]]:
    """Pure-Python BM25 oracle (ranking.c:27-91): query split on whitespace
    only (ranking.c:37), lowercase, stopword filter, stem; scores ADD across
    query terms; returns top_k (doc_id, score) with score > 0, sorted by
    score desc then doc_id asc (deterministic tie-break; the C qsort is
    unstable on ties)."""
    if total_docs <= 0:
        return []
    avg_dl = sum(doc_lengths.get(d, 0) for d in range(total_docs)) / total_docs
    scores: dict[int, float] = {}
    sw = set(stopwords)
    for tok in query.split():
        tok = tok.lower()
        if tok in sw:
            continue
        term = stem(tok)
        plist = postings.get(term)
        if not plist:
            continue
        df = len(plist)
        idf = bm25_idf(total_docs, df)
        for d, tf in plist.items():
            dl = doc_lengths.get(d, 0)
            scores[d] = scores.get(d, 0.0) + bm25_term_score(tf, dl, avg_dl, idf)
    ranked = sorted(((d, s) for d, s in scores.items() if s > 0),
                    key=lambda x: (-x[1], x[0]))
    return ranked[:top_k]
