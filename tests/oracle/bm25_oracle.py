"""Independent numpy BM25 oracle (SURVEY §5.2 item 2).

Implements Lucene 9 BM25 (the reference's OpenSearch default similarity,
no (k1+1) factor) from the formula alone — it shares NO code with the
engine: tokenization uses Python ``re``, stats plain dicts, scoring a
direct transcription of the formula.  Ties: score desc, doc_id asc.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


class Bm25Oracle:
    def __init__(self, docs: dict[int, str], k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        self.tf: dict[int, Counter] = {}
        self.dl: dict[int, int] = {}
        df: Counter = Counter()
        for doc_id, text in docs.items():
            toks = tokenize(text)
            c = Counter(toks)
            self.tf[doc_id] = c
            self.dl[doc_id] = len(toks)
            df.update(c.keys())
        self.df = df
        self.n_docs = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, doc_id: int, terms: list[str]) -> float:
        s = 0.0
        dl = self.dl[doc_id]
        for t in terms:
            tf = self.tf[doc_id].get(t, 0)
            if tf == 0 or t not in self.df:
                continue
            tfn = tf / (tf + self.k1 * (1 - self.b + self.b * dl / self.avgdl))
            s += self.idf(t) * tfn
        return s

    def topk(self, query: str, k: int) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(query)))
        terms = [t for t in terms if t in self.df]
        if not terms:
            return []
        scored = [
            (doc_id, self.score(doc_id, terms))
            for doc_id in self.tf
            if any(t in self.tf[doc_id] for t in terms)
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]
