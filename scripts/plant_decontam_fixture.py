#!/usr/bin/env python3
"""Planted fixture for the fuzzy-decontam oracle (ADVICE r5: on the sf
fixtures decontam_minhash returns 0 rows, so its DuckDB oracle SQL only
ever compared empty-to-empty). This writes a documents.parquet where the
benchmark split (doc_id % 97 == 0) has known near-copies in the corpus
split, so the Spark query and the oracle SQL are both forced through
their non-empty paths and the hash compare carries real values.

Usage:
  python3 scripts/plant_decontam_fixture.py /tmp/decontam_fix
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /tmp/decontam_fix /tmp/decontam_out decontam_minhash"
  python3 scripts/check.py /tmp/decontam_out /tmp/decontam_fix decontam_minhash
"""
import os, sys
import duckdb


def text(prefix: str, n: int, edit_tail=None):
    toks = [f"{prefix}{i}" for i in range(1, n + 1)]
    if edit_tail:
        toks = toks[: n - len(edit_tail)] + list(edit_tail)
    return " ".join(toks)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decontam_fix"
    os.makedirs(out, exist_ok=True)
    rows = []
    # three benchmark docs (id % 97 == 0), each with one near-copy in the
    # corpus (high shingle Jaccard, not exact) and decoy corpus docs that
    # share nothing. Distinct vocab per family keeps matches unambiguous.
    for k, bench_id in enumerate([97, 194, 291]):
        p = f"fam{k}tok"
        rows.append((bench_id, text(p, 40), "en", "eval", 300))
        rows.append((10 + k, text(p, 40, edit_tail=[f"edit{k}a", f"edit{k}b"]),
                     "en", "web", 300))
        rows.append((20 + k, text(f"decoy{k}tok", 40), "en", "web", 300))
    # one exact duplicate of a benchmark doc (jaccard = 1.0 path)
    rows.append((30, text("fam0tok", 40), "en", "web", 300))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} docs to {out}/documents.parquet "
          f"(3 benchmark docs, 4 planted contaminations)")


if __name__ == "__main__":
    main()
