#!/usr/bin/env python3
"""Build the df-adversarial documents fixture for the MaxGramDf cap
mirror (r12 ask #3): a corpus whose hottest 3-token shingle has
df = 70 > MaxGramDf = 64, so any oracle that counts UNCAPPED gram
overlaps diverges from the df-capped plan. With the cap mirrored into
the q299/q307 oracles (the `gok` CTE), both sides must stay green
HERE, not just on fixtures whose max df sits under the cap.

Usage:
  python3 scripts/dfcap_fixture.py /tmp/dfcap
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/dfcap \
      /tmp/dfcap_out q299_lsh_operating_point q307_percolation_sweep"
  python3 scripts/compare.py /tmp/dfcap_out /tmp/dfcap \
      q299_lsh_operating_point q307_percolation_sweep

Fixture shape:
  - docs 0..69 share the boilerplate shingle "common boiler plate"
    (df = 70, OVER the cap) plus one unique tail shingle each — under
    an uncapped count every pair of them shares a gram; under the cap
    none do.
  - docs 100..163 share "edge case gram" (df = 64, AT the cap —
    inclusive boundary) and each near-dup pair 100+2i/101+2i shares
    enough grams to clear the J >= 0.3 percolation floor.
  - docs 200/201 are true near-dups through rare grams (df = 2).
"""
import os
import sys

import duckdb


def text_for(doc):
    if doc < 70:
        # boilerplate + unique tail: 5 tokens -> 3 shingles, one hot
        return f"common boiler plate u{doc} v{doc}"
    if doc < 200:
        i = doc - 100
        pair = i // 2
        # shared edge-cap gram + a per-PAIR body (near-dup inside the
        # pair, distinct across pairs)
        return f"edge case gram body{pair} mid{pair} tail{pair} x{i % 2}"
    # rare-gram true near-dups
    return f"rare shared shingle only here doc{doc}"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfcap"
    os.makedirs(out, exist_ok=True)
    rows = []
    for doc in list(range(70)) + list(range(100, 164)) + [200, 201]:
        t = text_for(doc)
        rows.append((doc, t, "en", f"src{doc % 3}", len(t)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(
        f"COPY documents TO '{out}/documents.parquet' (FORMAT PARQUET)")
    # sanity: the fixture really is df-adversarial
    df = con.sql("""
        WITH t AS (SELECT doc_id,
            string_split_regex(lower(trim(text)), '\\s+') AS toks
          FROM documents),
        sh AS (SELECT doc_id,
            list_distinct(list_transform(range(len(toks)-2),
              i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
            AS grams FROM t WHERE len(toks) >= 3),
        e AS (SELECT doc_id, unnest(grams) AS g FROM sh)
        SELECT g, count(*) AS df FROM e GROUP BY g
        ORDER BY df DESC LIMIT 3""").fetchall()
    print(f"wrote {len(rows)} docs to {out}/documents.parquet")
    print("top gram dfs:", df)
    assert df[0][1] > 64, "fixture lost its over-cap gram"
    assert any(d == 64 for _, d in df), "fixture lost its at-cap gram"


if __name__ == "__main__":
    main()
