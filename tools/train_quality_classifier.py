"""Train the checked-in quality-classifier weights.

Distills the rule-based ``quality_score`` gate (length band +
punctuation sanity + stopword presence — the same composite the
``ts_quality_score`` entry exposes) into a hashed-unigram logistic
model, the standard bootstrap when no human quality labels exist
(CCNet / RefinedWeb pattern). Deterministic: fixed split seed, full-
batch GD, fixed step count.

Writes ``vectordb_light_spark/functions/quality_weights.py`` with the
quantized integer weights plus provenance + held-out metrics.

Usage: python tools/train_quality_classifier.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

from vectordb_light_spark.operators.quality_model import (  # noqa: E402
    DEFAULT_N_BUCKETS,
    DEFAULT_SCALE,
    hashed_count_features,
    quantize_logreg,
    train_quality_logreg,
)

LABEL_SQL = r"""
WITH t AS (
    SELECT doc_id, text,
           length(text) AS n,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE
                     / length(text) END AS pr,
           CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+')) = 0
                THEN 0.0
                ELSE len(list_filter(
                    regexp_split_to_array(lower(trim(text)), '\s+'),
                    x -> list_contains(
                        ['the','a','an','and','or','of','to','in','is','it',
                         'that','for','on','with','as','was','at','by','be'],
                        regexp_replace(x, '[^\w]', '', 'g'))))::DOUBLE
                     / len(regexp_split_to_array(lower(trim(text)), '\s+'))
           END AS swr
    FROM read_parquet(?)
)
SELECT doc_id, text,
       least(n / 500.0, 1.0) * 0.4
       + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.3
       + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.3 AS q
FROM t ORDER BY doc_id
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.execute(LABEL_SQL, [f"{sf_dir}/documents.parquet"]).fetchall()
    texts = [r[1] for r in rows]
    y = np.array([1.0 if r[2] >= 0.8 else 0.0 for r in rows])
    X = hashed_count_features(texts, DEFAULT_N_BUCKETS)

    rng = np.random.default_rng(0)
    idx = rng.permutation(len(rows))
    n_tr = int(len(rows) * 0.8)
    tr, te = idx[:n_tr], idx[n_tr:]
    w, b = train_quality_logreg(X[tr], y[tr])

    def acc(s):
        p = 1.0 / (1.0 + np.exp(-np.clip(X[s] @ w + b, -30, 30)))
        return float(np.mean((p > 0.5) == y[s]))

    base = float(max(y[te].mean(), 1 - y[te].mean()))
    print(f"n={len(rows)} pos={y.mean():.3f} "
          f"train_acc={acc(tr):.3f} test_acc={acc(te):.3f} test_base={base:.3f}")

    wq, bq = quantize_logreg(w, b, scale=DEFAULT_SCALE)
    out = "vectordb_light_spark/functions/quality_weights.py"
    with open(out, "w") as f:
        f.write(
            '"""Checked-in quality-classifier weights (GENERATED — do not\n'
            "edit by hand; regenerate with tools/train_quality_classifier.py).\n"
            "\n"
            f"Provenance: hashed-unigram logistic model distilled from the\n"
            f"rule-based quality_score gate (label = quality >= 0.8) on\n"
            f"{sf_dir}/documents.parquet; deterministic 80/20 split (seed 0),\n"
            f"full-batch GD (lr=0.05, l2=1e-4, 1500 steps).\n"
            f"Held-out: test_acc={acc(te):.3f} vs majority base={base:.3f}\n"
            f"(train_acc={acc(tr):.3f}, n={len(rows)}, pos_frac={y.mean():.3f}).\n"
            '"""\n\n'
            f"N_BUCKETS = {DEFAULT_N_BUCKETS}\n"
            f"SCALE = {DEFAULT_SCALE}\n"
            f"BIAS_Q = {bq}\n"
            f"WEIGHTS_Q = {wq!r}\n"
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
