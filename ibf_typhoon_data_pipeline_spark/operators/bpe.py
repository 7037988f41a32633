"""Byte-pair-encoding tokenizer training as a driver-fit model with
integer sufficient statistics — the hist-GBT pattern applied to
tokenization (Sennrich et al. 2016, ACL: BPE trains on the WORD
FREQUENCY table, not the raw corpus, so the engine's contribution is
one groupBy producing a bounded (word, count) frame; the merge-rule
search is a deterministic pure-Python fold both engines share).

Parity design:
- The fit consumes a top-K word-frequency list ordered by
  (count DESC, word ASC) — identical rows from Spark SQL and DuckDB
  on the same parquet, so the learned merges are identical.
- Application is a chain of plain `replace()` calls over the
  space-separated character representation. Spark and DuckDB both
  implement replace() as leftmost non-overlapping replace-all
  (verified), which is exactly the merge semantics the fit uses
  (str.replace), so fit-time and apply-time tokenizations agree.
- Merged symbols contain no spaces or quotes (guarded), so the
  generated SQL needs no escaping.
"""

from __future__ import annotations

_N_MERGES = 10
_VOCAB_CAP = 4096


def fit_bpe_merges(
    word_freq: list[tuple[str, int]], n_merges: int = _N_MERGES
) -> list[tuple[str, str]]:
    """Deterministic BPE merge-rule search over a (word, count) list.

    Ties on pair frequency break to the lexicographically smallest
    (a, b) pair, so the result is a pure function of the input rows.
    """
    words: dict[str, int] = {}
    for w, c in word_freq:
        if not w:
            continue
        if "'" in w or " " in w:
            raise ValueError(f"unsupported symbol chars in word {w!r}")
        s = " ".join(w)
        words[s] = words.get(s, 0) + int(c)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for s, c in words.items():
            syms = s.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        mc = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == mc)
        merges.append((a, b))
        nxt: dict[str, int] = {}
        for s, c in words.items():
            t = s.replace(f"{a} {b}", f"{a}{b}")
            nxt[t] = nxt.get(t, 0) + c
        words = nxt
    return merges


def bpe_merge_sql(merges: list[tuple[str, str]], col: str = "spaced") -> str:
    """Shared SQL text applying the merge chain to a space-separated
    character column. Linear chain — one replace per learned rule."""
    e = col
    for a, b in merges:
        e = f"replace({e}, '{a} {b}', '{a}{b}')"
    return e


# token count of a merged (still space-separated) representation
BPE_TOKCOUNT_SQL = (
    "CAST(length(merged) - length(replace(merged, ' ', '')) + 1 AS BIGINT)"
)

# the bounded fit input: top-K words by (count DESC, word ASC)
def bpe_stats_sql(token_source: str) -> str:
    return (
        f"SELECT word, CAST(count(*) AS BIGINT) AS c FROM {token_source} "
        "GROUP BY word "
        f"ORDER BY c DESC, word ASC LIMIT {_VOCAB_CAP}"
    )
