"""Distributed BPE tokenizer training + corpus encoding (X39).

The reference has no tokenizer stage (its corpus is page images —
/root/reference/src/stage2_ocr.py:406-442 ingests rendered PDFs); this
module extends the graft's training-data surface (SURVEY.md §2.8) with
the tokenizer-training step every LLM data pipeline runs over its
corpus.

Scale architecture — the shape SentencePiece / HF tokenizers use on
web-scale corpora, expressed Spark-first:

  1. **Weighted word count** — the only corpus-bound stage: one
     partial-aggregated groupBy (map-side combine collapses repeats
     before the shuffle), so the exchange carries |vocab| rows, not
     |corpus| tokens.
  2. **Merge learning** over the BOUNDED top-V weighted vocabulary.
     |vocab| ≪ corpus (V caps the driver transfer at a few MB
     regardless of corpus size), so the driver-side merge loop is the
     honest architecture, not a shortcut — pair statistics of a
     weighted vocab are EXACTLY the corpus's pair statistics.
  3. **Encoding** fans back out as a narrow broadcast-merges Arrow
     kernel (mapInPandas): merges are a few KB, the corpus never
     moves, and a per-worker word→tokens memo collapses Zipf-repeated
     words to dict hits.

Determinism (engine- and partitioning-independent, required for the
witness oracle): pair ties break on the lexicographically smallest
(left, right); vocabulary truncation orders by (count DESC, word ASC);
encoding merges the lowest-rank pair left-to-right — no set iteration
order anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "learn_bpe",
    "encode_word",
    "word_counts_df",
    "top_vocab",
    "train_bpe",
    "bpe_encode_kernel",
    "ENCODE_DDL",
]


# --------------------------------------------------------------------------
# pure kernel (no Spark) — shared by the distributed path and the
# single-process witness twin (scripts/gen_witness.py)
# --------------------------------------------------------------------------
def learn_bpe(
    word_counts: Mapping[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a weighted vocabulary.

    Symbols start as unicode characters (no end-of-word marker: words
    are encoded independently, so a marker would only rename the last
    symbol).  Each round merges the (left, right) pair with the highest
    corpus-weighted count; ties break on the lexicographically smallest
    pair.  Stops early when the best pair's count drops below
    ``min_count`` (merging a singleton pair is fixture noise, not
    vocabulary).
    """
    vocab: dict[tuple[str, ...], int] = {}
    for word, wc in word_counts.items():
        if len(word) >= 2:
            syms = tuple(word)
            vocab[syms] = vocab.get(syms, 0) + int(wc)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + wc
        if not pairs:
            break
        # max count, then lexicographically smallest pair — a total
        # order, so the winner is unique and engine-independent
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, wc in vocab.items():
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if (
                    i < n - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + wc
        vocab = new_vocab
    return merges


def encode_word(
    word: str, ranks: Mapping[tuple[str, str], int]
) -> list[str]:
    """Encode one word with learned merges (lowest rank first — the
    standard BPE inference loop).  Left-to-right within a rank, so the
    result is deterministic for overlapping occurrences."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------
def word_counts_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) weighted vocabulary — the corpus-bound stage.

    One partial-aggregated shuffle: explode stays in the same stage as
    the scan, the hash aggregate combines map-side, and only distinct
    words cross the exchange."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def top_vocab(wc: DataFrame, vocab_cap: int) -> list[tuple[str, int]]:
    """Bounded driver transfer: top-``vocab_cap`` words by
    (wc DESC, word ASC) — a TakeOrdered, never a full sort; the result
    size is V rows regardless of corpus size."""
    rows = (
        wc.orderBy(F.desc("wc"), "word").limit(vocab_cap).collect()
    )
    return [(r["word"], r["wc"]) for r in rows]


def train_bpe(
    docs: DataFrame,
    n_merges: int = 64,
    vocab_cap: int = 20_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Distributed word count -> bounded vocab -> merge loop."""
    vocab = dict(top_vocab(word_counts_df(docs, text_col), vocab_cap))
    return learn_bpe(vocab, n_merges)


ENCODE_DDL = "doc_id long, n_words long, n_tokens long"


def bpe_encode_kernel(merges: list[tuple[str, str]], memo_cap: int = 200_000):
    """Iterator-of-batches encode kernel: (doc_id, text) ->
    (doc_id, n_words, n_tokens).

    The merges table (a few KB) ships in the task closure; a per-worker
    word→token-count memo turns the Zipf head of the corpus into dict
    hits, bounded by entry count AND key length so hostile inputs
    cannot pin executor memory."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        memo: dict[str, int] = {}
        for pdf in batches:
            ids, n_words, n_tokens = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    nt = memo.get(w)
                    if nt is None:
                        nt = len(encode_word(w, ranks))
                        if len(memo) < memo_cap and len(w) <= 64:
                            memo[w] = nt
                    total += nt
                ids.append(doc_id)
                n_words.append(len(words))
                n_tokens.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                }
            )

    return kernel
