"""Real byte-pair-encoding tokenizer (VERDICT r9 item 3).

The reference pipeline has no tokenizer at all; the LLM-curation tier
of this repo (sequence packing q67, temperature budgets q124, release
manifests) consumed ``textfns.bpe_token_count`` — a regex
APPROXIMATION.  This module replaces the approximation with a real
merge-table BPE (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", public ACL paper):

- :func:`train_bpe` — the classic training loop: start from
  characters, repeatedly merge the most frequent adjacent symbol pair.
  Pure Python, deterministic (ties break on lexicographically smallest
  pair), run over the EMBEDDED ``SEED_TEXT`` below — so the pinned
  merge table is derived and reproducible, not magic constants.
- :func:`merges` — the cached pinned table (``N_MERGES`` merges).
- :func:`encode_word` — reference encoder: repeatedly find the
  best-ranked (earliest-learned) pair present in the word and merge
  ALL its occurrences left-to-right; stop when no learned pair
  remains.  Used by tests and as the differential oracle for the
  distributed encoder in ``operators/tokenize.py``.

Distributed-inference contract (why one-merge-per-step is enough):
the Spark/DuckDB encoders apply ONE merge per recursion step — the
FIRST occurrence of the minimum-rank pair — rather than all
occurrences at once.  For a WELL-FORMED merge table this reaches the
identical fixpoint: any learned pair containing a merged symbol ``m``
was necessarily learned AFTER the merge that created ``m`` (its parts
did not exist as symbols before), so merging one occurrence of the
current minimum-rank pair ``p`` can only create pairs of strictly
higher rank — the remaining occurrences of ``p`` stay the minimum and
are consumed on the following steps, in left-to-right order, exactly
as the all-at-once rule would.  Tables produced by :func:`train_bpe`
are well-formed by construction; :func:`assert_well_formed` checks the
property and the test suite pins it.

Scale note: encoders must never run per-occurrence.  Tokenization is
Zipf-shaped — the operators in ``operators/tokenize.py`` encode each
DISTINCT word once (a vocabulary-sized recursion, tiny vs the corpus)
and join the result back to occurrences.
"""

from __future__ import annotations

import functools

# Symbol-pair separator inside encoded pair keys ("lo" + SEP + "w").
# U+001F (unit separator) never appears in the trained symbols (the
# seed text is printable ASCII); a corpus word that does contain it
# simply never matches a learned pair and stays character-split.
SEP = "\x1f"

# max_input_chars_per_word analog (WordPiece uses 100): words longer
# than this are pre-split into fixed 32-char chunks that are encoded
# independently.  Bounds the recursion depth of the distributed
# encoders at 31 steps (< Spark's default cteRecursionLevelLimit of
# 100) regardless of input; merges spanning a chunk boundary are lost,
# which for natural-language words of this length is a non-event (the
# sf corpus maxes out at 8 chars/word).
MAX_WORD_CHARS = 32

N_MERGES = 160

# Original prose written for this repo (NOT from the reference, NOT
# from the test corpus): generic data-engineering English, so the
# learned merges cover the letter statistics of the domain the
# documents table mimics.  Training is word-level on lowercased
# whitespace tokens; punctuation is part of a word's character stream.
SEED_TEXT = """
a data pipeline reads raw records from a source table and writes clean
rows to a target table. the query planner turns each query into a plan
of scans, filters, joins and aggregates. a scan reads a column from the
table, a filter drops rows, a join matches rows by key, and a group by
folds values into one row per key. the stream of batches flows through
the plan in order. a window holds the last values of a stream so the
job can sort, count and merge them. small tables broadcast to every
worker; large tables shuffle by hash of the join key. a sort orders
rows by value, a merge joins sorted runs, and a hash table probes keys
fast. the fast path stays in the engine; the slow path spills batches
to disk. vectors of values pack into batches so the scan stays fast.
the customer orders flow into a fact table and the parts and suppliers
form the small dimension tables. the big fact table partitions by date
so a query over one day scans one part of the data. each line of an
order holds a part, a count and a value. the window functions rank rows
in each group and the lag of a value gives the change from the last
row. streams of data arrive in order, the watermark bounds how late a
row can be, and the state store holds the groups that are still open.
the spark engine plans the query, the optimizer prunes columns and
pushes filters down to the scan, and the executor runs the plan over
the partitions of the table.
"""


def _words(text: str) -> list[str]:
    """Lowercased whitespace tokens (the same normalization the column
    operators use: collapse whitespace, lowercase, trim)."""
    return [w for w in text.lower().split() if w]


def train_bpe(text: str, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Sennrich BPE training: word-frequency-weighted pair counts over
    character-split words; each round merges the globally most frequent
    adjacent pair (ties: lexicographically smallest pair — fully
    deterministic) in every word.  Stops early when no pair occurs at
    least twice (a pair seen once carries no compression and would make
    the tail of the table an arbitrary ordering of singletons)."""
    from collections import Counter

    word_freq = Counter(_words(text))
    # symbol sequences per distinct word
    seqs: dict[str, list[str]] = {w: list(w) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, seq in seqs.items():
            f = word_freq[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (p1, p2), cnt = best
        if cnt < 2:
            break
        merges.append((p1, p2))
        merged = p1 + p2
        for w, seq in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == p1 and seq[i + 1] == p2:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


@functools.lru_cache(maxsize=1)
def merges() -> tuple[tuple[str, str], ...]:
    """The pinned merge table: BPE trained on ``SEED_TEXT``."""
    return tuple(train_bpe(SEED_TEXT, N_MERGES))


def assert_well_formed(table: tuple[tuple[str, str], ...]) -> None:
    """Raise if any merge uses a multi-char symbol that no EARLIER
    merge produced — the property the one-merge-per-step distributed
    encoders rely on (see module docstring)."""
    produced: set[str] = set()
    for i, (p1, p2) in enumerate(table):
        for part in (p1, p2):
            if len(part) > 1 and part not in produced:
                raise AssertionError(
                    f"merge {i} ({p1!r},{p2!r}) uses symbol {part!r} "
                    "never produced by an earlier merge"
                )
        produced.add(p1 + p2)


def _rank(table: tuple[tuple[str, str], ...] | None = None) -> dict[tuple[str, str], int]:
    t = table if table is not None else merges()
    return {p: i for i, p in enumerate(t)}


def encode_word(word: str,
                table: tuple[tuple[str, str], ...] | None = None) -> list[str]:
    """Reference encoder (all-occurrences-of-best-pair): the classic
    inference loop, applied per ≤``MAX_WORD_CHARS`` chunk."""
    rank = _rank(table)
    out: list[str] = []
    for start in range(0, len(word), MAX_WORD_CHARS):
        seq = list(word[start:start + MAX_WORD_CHARS])
        while len(seq) > 1:
            ranked = [(rank.get((a, b)), i)
                      for i, (a, b) in enumerate(zip(seq, seq[1:]))
                      if (a, b) in rank]
            if not ranked:
                break
            best_rank = min(r for r, _ in ranked)
            p1, p2 = (merges() if table is None else table)[best_rank]
            merged, new, i = p1 + p2, [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == p1 and seq[i + 1] == p2:
                    new.append(merged)
                    i += 2
                else:
                    new.append(seq[i])
                    i += 1
            seq = new
        out.extend(seq)
    return out


def encode_word_single_step(word: str,
                            table: tuple[tuple[str, str], ...] | None = None
                            ) -> list[str]:
    """One-merge-per-step encoder — the EXACT rule the Spark/DuckDB
    recursive CTEs implement (first occurrence of the minimum-rank
    pair, one per step).  Kept as a separate mirror so the equivalence
    with :func:`encode_word` is testable, not just argued."""
    rank = _rank(table)
    t = table if table is not None else merges()
    out: list[str] = []
    for start in range(0, len(word), MAX_WORD_CHARS):
        seq = list(word[start:start + MAX_WORD_CHARS])
        while len(seq) > 1:
            ranks = [rank.get((a, b)) for a, b in zip(seq, seq[1:])]
            present = [r for r in ranks if r is not None]
            if not present:
                break
            idx = ranks.index(min(present))
            p1, p2 = t[min(present)]
            seq = seq[:idx] + [p1 + p2] + seq[idx + 2:]
        out.extend(seq)
    return out
