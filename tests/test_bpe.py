"""BPE training: Spark merge loop pinned against a pure-Python
reference implementation."""

from asid_v2_data_pipeline_spark.functions.bpe import (
    encode_words,
    train_bpe_merges,
)


def _ref_bpe(word_freqs: dict[str, int], num_merges: int):
    """Reference BPE (Sennrich et al. 2016 pseudocode, greedy leftmost
    application, ties by (count desc, a, b))."""
    table = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in table.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in table.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            table[w] = out
    return merges, table


def test_merge_list_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "newer newest new new newer",
        "wider wide widest wider",
        "low newer wide lowest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    ref_merges, ref_table = _ref_bpe(wf, 8)
    got = train_bpe_merges(df, "text", 8)
    assert got == ref_merges

    enc = encode_words(
        spark.createDataFrame([(w,) for w in sorted(wf)], "word string"),
        "word",
        got,
    )
    got_syms = {r["word"]: list(r["syms"]) for r in enc.collect()}
    assert got_syms == {w: ref_table[w] for w in sorted(wf)}


def test_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    merges = train_bpe_merges(df, "text", 10)
    assert merges == []  # every pair count is 1 -> below the repeat floor
