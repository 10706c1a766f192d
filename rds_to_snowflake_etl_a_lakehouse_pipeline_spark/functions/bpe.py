"""Learned byte-pair-encoding tokenizer (Sennrich et al. 2016 — the
public BPE algorithm every modern LLM tokenizer descends from).

:mod:`.text` ships two token-count approximations (whitespace and a
chars-per-token ratio); sequence packing and mixture budgeting get
materially better when counts come from a real subword vocabulary.
Split of work follows the data sizes:

- :func:`learn_bpe` runs DRIVER-SIDE on a bounded sample. Merge
  learning is inherently sequential (merge i+1's pair statistics
  depend on merge i), so it cannot be a distributed pass — but it only
  needs corpus-representative pair statistics, which a 10k-document
  sample provides. The distributed part is the sampling itself.
- :func:`bpe_token_count` / :func:`bpe_tokens` apply the learned merge
  table corpus-wide as Arrow-vectorized kernels. The merge table ships
  in the UDF closure (a few KB — broadcast with the task binary), and
  a per-batch word cache makes the amortized cost one segmentation per
  DISTINCT word per batch, not per occurrence.

Determinism: ties in pair frequency break lexicographically, so the
learned merge list is a pure function of the sample; the sample is
seeded. Same corpus + same params → same vocabulary on every run.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_END = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_END,)


def learn_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    sample_rows: int = 10_000,
    seed: int = 42,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a bounded sample of the
    corpus. Returns the ordered merge list (rank = position)."""
    n = df.count()
    sample = df.select(text_col)
    if n > sample_rows:
        sample = sample.sample(sample_rows / n, seed=seed)
    texts = [r[0] for r in sample.collect() if r[0]]
    word_counts: Counter = Counter()
    for t in texts:
        if lowercase:
            t = t.lower()
        word_counts.update(t.split())
    vocab = {_word_symbols(w): c for w, c in word_counts.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first application of the merge table to one
    word — the canonical BPE inference loop."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _make_kernel(merges: list[tuple[str, str]], lowercase: bool, count_only: bool):
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def kernel(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(0 if count_only else [])
                continue
            if lowercase:
                t = t.lower()
            if count_only:
                total = 0
                for w in t.split():
                    toks = cache.get(w)
                    if toks is None:
                        toks = segment_word(w, ranks)
                        cache[w] = toks
                    total += len(toks)
                out.append(total)
            else:
                doc = []
                for w in t.split():
                    toks = cache.get(w)
                    if toks is None:
                        toks = segment_word(w, ranks)
                        cache[w] = toks
                    doc.extend(toks)
                out.append(doc)
        return pd.Series(out)

    return kernel


def bpe_token_count(
    col: Column | str, merges: list[tuple[str, str]], lowercase: bool = True
) -> Column:
    """Exact learned-BPE token count per document (Arrow kernel with a
    per-batch distinct-word cache). The drop-in upgrade for
    ``pack_sequences``' budget column and mixture token accounting."""
    f = pandas_udf("int")(_make_kernel(merges, lowercase, count_only=True))
    return f(F.col(col) if isinstance(col, str) else col)


def bpe_tokens(
    col: Column | str, merges: list[tuple[str, str]], lowercase: bool = True
) -> Column:
    """The BPE token sequence itself (``array<string>``, ``</w>``
    marking word ends) — input for vocabulary audits or n-gram stats
    over subwords."""
    f = pandas_udf("array<string>")(_make_kernel(merges, lowercase, count_only=False))
    return f(F.col(col) if isinstance(col, str) else col)
