"""Distributed BPE-merge training (operators/bpe.py)."""

from __future__ import annotations

import re

from conftest import SF_CORRECT


def _py_bpe_reference(texts, k, token_re):
    """Straightforward classic-BPE loop: word freqs → per round count all
    adjacent pairs → argmax (count DESC, lhs, rhs) → greedy left-to-right
    non-overlapping merge. The independent spec the positional run-parity
    construction must reproduce."""
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(re.findall(token_re, t.lower()))
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, f in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((len(merges) + 1, a, b, c))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_python_reference_on_fixture(spark):
    """The distributed trainer must reproduce the classic greedy loop on
    the real corpus — including compositional merges (a learned symbol
    re-entering later pairs)."""
    from data_engineer_development_spark.operators.bpe import (
        BPE_TOKEN_RE,
        bpe_train,
    )
    from data_engineer_development_spark.sources import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    exp = _py_bpe_reference(texts, 8, BPE_TOKEN_RE)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(docs, k_merges=8).orderBy("rank").collect()
    ]
    assert got == exp


def test_bpe_run_parity_merge_on_crafted_runs(spark):
    """The a = b run-parity rule is the delicate part: 'aaaa' must merge
    to ('aa','aa'), 'aaa' to ('aa','a'), with the merged symbol then
    pairing compositionally. A corpus engineered so (a,a) wins round 1
    and (aa,aa) wins round 2 pins both."""
    from data_engineer_development_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, "aaaa aaaa aaaa aaa") for i in range(3)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(docs, k_merges=3).orderBy("rank").collect()
    ]
    # round 1: (a,a) count = 3 words * (3+3+3+2 adjacent) ... all-adjacent
    # counting: 'aaaa' has 3, 'aaa' has 2 → freq-weighted 3*(3*3+2)=33? each
    # distinct word counted once with its corpus freq: 'aaaa' f=9, 'aaa' f=3
    # → 9*3 + 3*2 = 33. Then 'aaaa'→[aa,aa], 'aaa'→[aa,a]:
    # round 2 pairs: (aa,aa) f 9, (aa,a) f 3 → (aa,aa) wins.
    assert got[0] == (1, "a", "a", 33)
    assert got[1] == (2, "aa", "aa", 9)
    exp = _py_bpe_reference(["aaaa aaaa aaaa aaa"] * 3, 3, "[a-z]+|[0-9]+|[^a-z0-9 ]")
    assert got == exp


def test_bpe_train_oracle_parity(spark):
    """Round-12+ registration candidate (staged): hash-exact parity at
    both fixture SFs — the whole trainer is integer/string arithmetic, so
    the learned merge table must agree exactly."""
    from data_engineer_development_spark.queries.extras import (
        _bpe_train_sql,
        q_bpe_train,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import compare

    sql = _bpe_train_sql()
    for sf_dir in (SF_SMOKE, SF_CORRECT):
        ok, msg = compare(spark, sf_dir, "bpe_train", q_bpe_train, sql)
        assert ok, f"{sf_dir}: {msg}"


def test_bpe_batched_oracle_parity(spark):
    """r14 oracle pairing (VERDICT r13 #2): hash-exact engine↔DuckDB
    parity for the BATCHED trainer at both fixture SFs — the unrolled
    snapshot/greedy/apply rounds must agree exactly."""
    from data_engineer_development_spark.queries.extras import (
        _bpe_batched_sql,
        q_bpe_train_batched,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import compare

    sql = _bpe_batched_sql()
    for sf_dir in (SF_SMOKE, SF_CORRECT):
        ok, msg = compare(
            spark, sf_dir, "bpe_train_batched", q_bpe_train_batched, sql
        )
        assert ok, f"{sf_dir}: {msg}"


def test_bpe_batched_oracle_matches_mirror_randomized():
    """Hypothesis over adversarial tiny corpora: the unrolled batched
    oracle (rounds=4 covers k=3/batch_m≤2 worst case) must equal the
    batched spec's python mirror — including conflict rounds that accept
    fewer than batch_m pairs. DuckDB-only per example (fast); the Spark
    side is pinned to the same mirror on the fixture."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineer_development_spark.queries.extras import (
        _bpe_batched_sql,
    )

    words = st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(words, min_size=1, max_size=4),
        st.integers(1, 3),
        st.integers(1, 2),
    )
    def run(docs_words, k, m):
        texts = [" ".join(ws) for ws in docs_words]
        try:
            exp = _py_bpe_batched_mirror(
                texts, k, m, "[a-z]+|[0-9]+|[^a-z0-9 ]"
            )
        except ValueError:
            return  # corpus exhausts before k merges — engine raises too
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?)", [(t,) for t in texts]
        )
        got = con.execute(
            _bpe_batched_sql(k=k, batch_m=m, rounds=4)
        ).fetchall()
        assert [tuple(r) for r in got] == [tuple(e) for e in exp]

    run()


def test_bpe_oracle_matches_python_reference_randomized():
    """Hypothesis over adversarial tiny corpora (alphabet {a,b,c} with
    long runs — the run-parity minefield): the unrolled DuckDB oracle
    must equal the classic greedy loop. DuckDB-only per example (fast);
    the Spark side is pinned to the same reference on the fixture and
    the crafted-run corpus above."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineer_development_spark.queries.extras import _bpe_train_sql

    words = st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(words, min_size=1, max_size=4), st.integers(1, 3))
    def run(docs_words, k):
        texts = [" ".join(ws) for ws in docs_words]
        exp = _py_bpe_reference(texts, k, "[a-z]+|[0-9]+|[^a-z0-9 ]")
        if len(exp) < k:
            return  # corpus exhausts before k merges — operator asserts,
            #         oracle would emit fewer rows; out of contract
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        for i, t in enumerate(texts):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
        got = [
            (int(r[0]), r[1], r[2], int(r[3]))
            for r in con.execute(_bpe_train_sql(k)).fetchall()
        ]
        con.close()
        assert got == exp, (texts, k, got, exp)

    run()


def test_bpe_encode_stats_oracle_parity_and_consistency(spark):
    """Round-12+ registration candidate (staged): hash-exact parity at
    both fixture SFs; per-doc invariants — BPE tokens never exceed the
    char baseline, never undercut the word count, and 8 merges buy REAL
    compression somewhere (strict inequality on the corpus total)."""
    from data_engineer_development_spark.queries.extras import (
        _bpe_encode_sql,
        q_bpe_encode_stats,
    )
    from tests.conftest import SF_SMOKE
    from tests.oracle_harness import compare

    sql = _bpe_encode_sql()
    for sf_dir in (SF_SMOKE, SF_CORRECT):
        ok, msg = compare(
            spark, sf_dir, "bpe_encode_stats", q_bpe_encode_stats, sql
        )
        assert ok, f"{sf_dir}: {msg}"

    rows = q_bpe_encode_stats(spark, SF_CORRECT).collect()
    assert all(r["n_words"] <= r["n_tokens_bpe"] <= r["n_chars_tok"] for r in rows)
    assert sum(r["n_tokens_bpe"] for r in rows) < sum(r["n_chars_tok"] for r in rows)


def test_bpe_oracle_multibyte_chars_match_reference():
    """Unicode stance, pinned: the pre-tokenizer emits every non-ASCII
    char as its own single-char word ([^a-z0-9 ] is a one-char class),
    so multibyte text never reaches the char-split/merge path as a
    multi-symbol word — and the engines agree on the counts regardless
    (DuckDB/py both count CHARACTERS, not bytes)."""
    import duckdb

    from data_engineer_development_spark.queries.extras import _bpe_train_sql

    texts = ["héé 中中中 aé ❤❤ héé", "é中 héé ❤❤ zzz"]
    exp = _py_bpe_reference(texts, 3, "[a-z]+|[0-9]+|[^a-z0-9 ]")
    assert exp[0][1] == "z"  # merges can only form inside ASCII words
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = [
        (int(r[0]), r[1], r[2], int(r[3]))
        for r in con.execute(_bpe_train_sql(3)).fetchall()
    ]
    con.close()
    assert got == exp


def test_bpe_train_handles_backslash_and_quote_tokens(spark):
    """Spark SQL literals are C-style-escaped (unlike DuckDB): a corpus
    whose winning pair involves backslash or quote single-char tokens
    must train without parse errors and match the python reference —
    the _sql_quote regression (review r11)."""
    from data_engineer_development_spark.operators.bpe import (
        BPE_TOKEN_RE,
        bpe_train,
    )

    # the DEFAULT tokenizer emits backslash/quote as single-char words
    # (no pairs possible), so the quoting path only triggers through a
    # CUSTOM token_re that admits them inside words — exactly the custom
    # regex the review flagged as silently mangled before the fix
    token_re = r"[a-z\\']+|[0-9]+|[^a-z0-9 ]"
    texts = [r"a\b a\b a\b c'd c'd"] * 2
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(docs, k_merges=3, token_re=token_re)
        .orderBy("rank")
        .collect()
    ]
    exp = _py_bpe_reference(texts, 3, token_re)
    assert got == exp
    assert any("\\" in (a + b) for _, a, b, _c in got)
    assert any("'" in (a + b) for _, a, b, _c in got)


def test_bpe_train_across_persist_checkpoint(spark):
    """k_merges > BPE_PERSIST_EVERY exercises the periodic re-persist
    (the O(k²) recompute bound): results must be identical to the
    reference across the checkpoint boundary."""
    from conftest import SF_SMOKE

    from data_engineer_development_spark.operators.bpe import (
        BPE_PERSIST_EVERY,
        BPE_TOKEN_RE,
        bpe_train,
    )
    from data_engineer_development_spark.sources import load_table

    k = BPE_PERSIST_EVERY + 2
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    exp = _py_bpe_reference(texts, k, BPE_TOKEN_RE)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(docs, k_merges=k).orderBy("rank").collect()
    ]
    assert got == exp


def test_bpe_train_k_merges_contract_bound(spark):
    """VERDICT r11 #3: k_merges is the trainer's job-count scale term —
    a 50k-merge call must fail at the contract, not schedule 50k
    sequential Spark jobs. The bound is a plan-time ValueError (survives
    `python -O`, unlike an assert)."""
    import pytest

    from data_engineer_development_spark.operators.bpe import (
        BPE_MAX_MERGES,
        bpe_train,
    )

    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    with pytest.raises(ValueError, match="BPE_MAX_MERGES"):
        bpe_train(docs, k_merges=BPE_MAX_MERGES + 1)


def _py_bpe_batched_mirror(texts, k, batch_m, token_re, candidate_factor=4):
    """Pure-python mirror of bpe_train_batched's SPEC (not its code): per
    round, snapshot all adjacent-pair counts, truncate to the same
    top-(want·candidate_factor) candidate window under (count DESC, lhs,
    rhs), run the REAL select_noninteracting (shared pure function), and
    apply accepted merges greedily left-to-right per pair."""
    from collections import Counter

    from data_engineer_development_spark.operators.bpe import (
        select_noninteracting,
    )

    words = Counter()
    for t in texts:
        words.update(re.findall(token_re, t.lower()))
    segs = {w: list(w) for w in words}

    def apply_one(a, b):
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out

    merges = []
    while len(merges) < k:
        want = min(batch_m, k - len(merges))
        pc: dict = Counter()
        for w, f in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            raise ValueError("exhausted")
        cands = sorted(
            ((a, b, c) for (a, b), c in pc.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )[: want * candidate_factor]
        for a, b, c in select_noninteracting(cands, want):
            merges.append((len(merges) + 1, a, b, c))
            apply_one(a, b)
    return merges


def test_bpe_batched_matches_mirror_on_fixture(spark):
    """The distributed batched trainer must reproduce its own spec's
    pure-python mirror on the real corpus (k=12, batch_m=4 → candidate
    conflicts actually occur on the 31-word fixture vocabulary)."""
    from data_engineer_development_spark.operators.bpe import (
        BPE_TOKEN_RE,
        bpe_train_batched,
    )
    from data_engineer_development_spark.sources import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    exp = _py_bpe_batched_mirror(texts, 12, 4, BPE_TOKEN_RE)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train_batched(docs, k_merges=12, batch_m=4)
        .orderBy("rank")
        .collect()
    ]
    assert got == exp


def test_bpe_batched_m1_equals_sequential(spark):
    """batch_m=1 is the exact sequential greedy: one accepted argmax per
    count snapshot — the reduction that anchors the approximation spec
    to the oracle-paired trainer."""
    from data_engineer_development_spark.operators.bpe import (
        bpe_train,
        bpe_train_batched,
    )
    from data_engineer_development_spark.sources import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    seq = [tuple(r) for r in bpe_train(docs, k_merges=10).orderBy("rank").collect()]
    bat = [
        tuple(r)
        for r in bpe_train_batched(docs, k_merges=10, batch_m=1)
        .orderBy("rank")
        .collect()
    ]
    assert bat == seq


def test_select_noninteracting_blocks_manufactured_symbols():
    """Symbol-disjointness alone is insufficient: ('a','b') manufactures
    'ab' tokens that a co-accepted ('ab','c') would consume, making
    within-round order matter — the concatenation checks must reject it.
    Also pins plain symbol reuse rejection and the batch_m cut."""
    from data_engineer_development_spark.operators.bpe import (
        select_noninteracting,
    )

    cands = [
        ("a", "b", 10),
        ("ab", "c", 9),   # consumes pair 1's product → rejected
        ("b", "d", 8),    # reuses pair 1's symbol b → rejected
        ("x", "y", 7),    # independent → accepted
        ("p", "q", 6),    # independent but beyond batch_m=2 → cut
    ]
    assert select_noninteracting(cands, 2) == [
        ("a", "b", 10), ("x", "y", 7),
    ]
    # a==b pair: run-parity case is a legal single accept
    assert select_noninteracting([("z", "z", 5)], 3) == [("z", "z", 5)]


def test_bpe_batched_mirror_randomized():
    """Hypothesis over adversarial tiny corpora: the batched spec's
    mirror must be deterministic and its accepted rounds must satisfy
    the non-interaction invariant (no symbol or product collision
    within a round). Pure-python per example (fast); the Spark side is
    pinned to the same mirror on the fixture above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(words, min_size=1, max_size=4), st.integers(1, 6),
           st.integers(1, 3))
    def run(docs_words, k, m):
        texts = [" ".join(ws) for ws in docs_words]
        try:
            a = _py_bpe_batched_mirror(
                texts, k, m, "[a-z]+|[0-9]+|[^a-z0-9 ]"
            )
            b = _py_bpe_batched_mirror(
                texts, k, m, "[a-z]+|[0-9]+|[^a-z0-9 ]"
            )
        except ValueError:
            return  # corpus exhausts before k merges — out of contract
        assert a == b and len(a) == k

    run()


def test_bpe_batched_round_count_contract(spark, monkeypatch):
    """Review r12: the batched trainer's job-count contract is on ROUNDS,
    not merges — a conflict-heavy corpus (every top candidate sharing a
    hot symbol) accepts ~1 pair/round, so k_merges<=BPE_MAX_MERGES*batch_m
    alone would admit a BPE_MAX_MERGES*batch_m-job runaway. Pin the round
    guard with a tiny patched ceiling and a single-letter-run corpus
    where every candidate conflicts."""
    import pytest

    from data_engineer_development_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaaaaaaaa aaaaaaaa aaaa")], "doc_id long, text string"
    )
    monkeypatch.setattr(B, "BPE_MAX_MERGES", 2)
    with pytest.raises(ValueError, match="round .* exceeds BPE_MAX_MERGES"):
        # k=6 <= 2*4 passes the merge-count guard; every round accepts
        # exactly one pair (all candidates share the evolving 'a...'
        # symbols), so round 3 must trip the round guard
        B.bpe_train_batched(docs, k_merges=6, batch_m=4)


def test_bpe_batched_matches_mirror_on_adversarial_corpora(spark):
    """Spark-vs-mirror on crafted adversarial corpora (the fixture test
    covers the natural case): single-letter runs (run-parity + every
    candidate conflicting → 1 accept/round), a product-collision corpus
    where an accepted pair's concatenation equals another candidate's
    symbol, and a tie-heavy uniform corpus."""
    from data_engineer_development_spark.operators.bpe import (
        BPE_TOKEN_RE,
        bpe_train_batched,
    )

    corpora = [
        ["aaaa aaaaaa aa", "aaa a aaaaa"],          # runs + conflicts
        ["ab abc ababc", "a b ab c bc abc"],        # 'a'+'b' makes 'ab'
        ["xy xy zw zw pq pq", "xy zw pq"],          # ties, all disjoint
    ]
    import pytest

    for texts in corpora:
        for k, m in ((4, 2), (6, 3)):
            docs = spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            )
            try:
                exp = _py_bpe_batched_mirror(texts, k, m, BPE_TOKEN_RE)
            except ValueError:
                # corpus exhausts before k merges — both sides must
                # refuse identically rather than silently truncate
                with pytest.raises(ValueError, match="exhausted"):
                    bpe_train_batched(docs, k_merges=k, batch_m=m)
                continue
            got = [
                (r["rank"], r["lhs"], r["rhs"], r["pair_count"])
                for r in bpe_train_batched(docs, k_merges=k, batch_m=m)
                .orderBy("rank")
                .collect()
            ]
            assert got == exp, (texts, k, m, got, exp)
