"""Deterministic byte-pair-encoding (BPE) merge application.

Public algorithm: Sennrich, Haddow & Birch, "Neural Machine Translation of
Rare Words with Subword Units" (ACL 2016) — iteratively replace the
highest-priority adjacent symbol pair with its merged symbol. The greedy
lowest-rank loop below is the shape the GPT-2 reference encoder
popularized; re-implemented from the paper, no external code.

The merges table is a FIXTURE, not a learned vocabulary: a fixed, ordered
rule list over lowercase characters, covering the frequent words of the
synthetic corpus so token counts are non-trivial (most corpus words
compress to 1-2 subwords; unseen words stay near character-level). A real
deployment swaps in a learned merges.txt — the application algorithm is
identical.

Well-formedness invariant (pinned by tests/test_subword.py): each rule's
two sides are either single characters or the OUTPUT of an earlier rule.
Under that invariant, greedy lowest-rank-first application and one-pass
sequential rule-order application produce identical segmentations (an
earlier pair can never become newly adjacent from a later merge, because
later outputs are strictly new symbols) — the property test runs both
formulations against each other.
"""

from __future__ import annotations

# Ordered merge rules (rank = position). Grouped per target word for
# readability; ORDER is load-bearing only across shared prefixes (e.g.
# (l,e) before (b,le) before (ta,ble)).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    # frequent function-word units
    ("t", "h"), ("th", "e"),                     # the
    ("a", "n"), ("i", "n"), ("e", "r"), ("o", "n"),
    ("r", "e"), ("a", "t"), ("o", "r"), ("s", "t"),
    ("a", "r"), ("l", "e"),
    # column — (co,l) must outrank value's (l,u), or greedy strands co|lu
    ("c", "o"), ("co", "l"), ("col", "u"), ("colu", "m"), ("colum", "n"),
    # table
    ("b", "le"), ("t", "a"), ("ta", "ble"),
    # value
    ("v", "a"), ("l", "u"), ("va", "lu"), ("valu", "e"),
    # window
    ("w", "in"), ("d", "o"), ("win", "do"), ("windo", "w"),
    # scan
    ("s", "c"), ("sc", "an"),
    # batch
    ("b", "at"), ("bat", "c"), ("batc", "h"),
    # part
    ("p", "ar"), ("par", "t"),
    # spark — builds on part's "par" (rank 8 group merges a|r, p|ar first)
    ("s", "par"), ("spar", "k"),
    # fast
    ("f", "a"), ("fa", "st"),
    # slow
    ("s", "l"), ("sl", "o"), ("slo", "w"),
    # query
    ("q", "u"), ("qu", "er"), ("quer", "y"),
    # stream
    ("st", "re"), ("stre", "a"), ("strea", "m"),
    # order
    ("or", "d"), ("ord", "er"),
    # group — before row's (r,o), which would otherwise strand g|ro
    ("g", "r"), ("gr", "o"), ("gro", "u"), ("grou", "p"),
    # line
    ("l", "in"), ("lin", "e"),
    # data
    ("d", "at"), ("dat", "a"),
    # key
    ("k", "e"), ("ke", "y"),
    # row
    ("r", "o"), ("ro", "w"),
    # hash
    ("h", "a"), ("ha", "s"), ("has", "h"),
    # join
    ("j", "o"), ("jo", "in"),
    # sort
    ("s", "or"), ("sor", "t"),
    # customer — (custo,m) must outrank merge's (m,er): custo|mer strands
    ("c", "u"), ("cu", "st"), ("cust", "o"), ("custo", "m"), ("custom", "er"),
    # merge
    ("m", "er"), ("mer", "g"), ("merg", "e"),
    # agg
    ("a", "g"), ("ag", "g"),
    # big
    ("b", "i"), ("bi", "g"),
    # small
    ("s", "m"), ("sm", "a"), ("sma", "l"), ("smal", "l"),
    # filter
    ("f", "i"), ("fi", "l"), ("fil", "t"), ("filt", "er"),
    # vector
    ("v", "e"), ("ve", "c"), ("vec", "t"), ("vect", "or"),
)


def merge_ranks(
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
) -> dict[tuple[str, str], int]:
    """pair -> priority (lower merges first)."""
    return {pair: i for i, pair in enumerate(merges)}


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy BPE: repeatedly merge every occurrence of the lowest-rank
    adjacent pair until no rankable pair remains."""
    symbols = list(word)
    while len(symbols) >= 2:
        best_rank = None
        best = None
        for pair in zip(symbols, symbols[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        merged = best[0] + best[1]
        out: list[str] = []
        i = 0
        n = len(symbols)
        while i < n:
            if i < n - 1 and symbols[i] == best[0] and symbols[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return tuple(symbols)


def bpe_encode_word_sequential(
    word: str, merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
) -> tuple[str, ...]:
    """Alternative formulation: apply each rule exhaustively IN RULE ORDER,
    one pass down the list. Equals the greedy form for well-formed merge
    tables (see module docstring); used as the independent test reference.
    """
    symbols = list(word)
    for a, b in merges:
        if len(symbols) < 2:
            break
        merged = a + b
        while True:
            out: list[str] = []
            i = 0
            n = len(symbols)
            changed = False
            while i < n:
                if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
                    out.append(merged)
                    i += 2
                    changed = True
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
            if not changed:
                break
    return tuple(symbols)
