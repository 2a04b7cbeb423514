"""End-to-end filter-model training pipeline: the weak-supervision loop
a curation team runs to turn a heuristic rule into a reusable quality
filter, as a user script.

1. train — batch-perceptron rounds against the keyword weak label
   (balanced classes, hashed presence features, damped updates); the
   learning curve must actually improve or the model is noise;
2. evaluate — score the held-out md5 25% split and read the confusion
   matrix; generalization is measured, not assumed;
3. tokenize — discover the corpus' first BPE merges and measure the
   encode compression they buy per source;
4. land the per-round curve, the confusion matrix, and the merge table
   in warehouse tables so every trained artifact is a time-travelable
   snapshot.

Every metric is an oracle-gated operator from the registry — the script
only composes them. Run: ``python examples/train_filter_model.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging
import tempfile

from iceberg_loader_spark import get_spark
from iceberg_loader_spark.tables import Warehouse
from iceberg_loader_spark.tables.table import Table

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(message)s")
logger = logging.getLogger(__name__)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def run_example(warehouse_path: str | None = None) -> dict:
    from iceberg_loader_spark.operators.retrieval import (
        perceptron_holdout_eval,
        perceptron_weak_label_train,
    )
    from iceberg_loader_spark.operators.text import (
        bpe_encode_compression,
        bpe_merge_rounds,
    )

    spark = get_spark("example_train_filter_model")
    warehouse_path = warehouse_path or tempfile.mkdtemp(prefix="wh_train_")
    wh = Warehouse(warehouse_path)

    # 1. train — the per-round curve is the health check: a flat or
    # oscillating curve means the features carry no signal for the label
    curve = perceptron_weak_label_train(spark, SF_DIR)
    rounds = curve.collect()
    for r in rounds:
        logger.info(
            "train round %d: %d/%d misclassified (acc %.2f%%)",
            r["round"], r["n_miss"], r["n_train"], r["acc_bps"] / 100,
        )
    first_acc, last_acc = rounds[0]["acc_bps"], rounds[-1]["acc_bps"]

    # 2. held-out evaluation — the number that decides whether the model
    # ships (bound once; re-invoking the operator would re-run training)
    holdout = perceptron_holdout_eval(spark, SF_DIR)
    cm = holdout.collect()[0]
    logger.info(
        "held-out: n=%d tp=%d fp=%d fn=%d tn=%d (acc %.2f%%)",
        cm["n_test"], cm["tp"], cm["fp"], cm["fn"], cm["tn"],
        cm["acc_bps"] / 100,
    )

    # 3. tokenizer artifacts — the merge table and what encoding with it
    # buys per source
    merges = bpe_merge_rounds(spark, SF_DIR)
    merge_rows = merges.collect()
    for m in merge_rows:
        logger.info(
            "bpe merge %d: ('%s', '%s') count=%d",
            m["round"], m["left_sym"], m["right_sym"], m["pair_count"],
        )
    compression = bpe_encode_compression(spark, SF_DIR)
    worst = compression.orderBy("symbols_per_char_bps").collect()[-1]

    # 4. land the artifacts as tables (one snapshot each)
    for ident, df in (
        ("db.filter_curve", curve),
        ("db.filter_holdout", holdout),
        ("db.bpe_merges", merges),
    ):
        Table.create(wh, ident, df.schema).append(df)
    landed = sum(
        wh.load_table(i).scan(spark).count()
        for i in ("db.filter_curve", "db.filter_holdout", "db.bpe_merges")
    )

    return {
        "rounds": len(rounds),
        "first_acc_bps": first_acc,
        "last_acc_bps": last_acc,
        "holdout_acc_bps": cm["acc_bps"],
        "holdout_n": cm["n_test"],
        "n_merges": len(merge_rows),
        "worst_symbols_per_char_bps": worst["symbols_per_char_bps"],
        "landed_rows": landed,
    }


if __name__ == "__main__":
    out = run_example()
    logger.info("result: %s", out)
