"""spark-submit entry point (north rule: `spark-submit --py-files` on a
multi-executor cluster).

Usage:
  spark-submit --master <url> --py-files edgesearch_spark.zip \\
      tools/submit_job.py build  --input <parquet_dir_or_nul_file> --out <index_dir> [--format parquet|nul] [--content-col content]
  spark-submit ... tools/submit_job.py search --index <index_dir> --url '/search?t=0_hello&c=0' [--scored]
  spark-submit ... tools/submit_job.py synth  --docs 100000 --out <index_dir>

The SparkSession is taken from spark-submit (getOrCreate without master);
`edgesearch_spark.session.package_zip()` produces the --py-files artifact.
Exit code 0 on success; JSON result lines on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys


def get_session():
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("edgesearch_spark_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_build(args) -> int:
    from edgesearch_spark.build import IndexConfig, build_index

    spark = get_session()
    if args.format == "nul":
        from edgesearch_spark.sources.nul_stream import read_documents_file

        corpus = read_documents_file(spark, args.input)
        metrics = build_index(spark, corpus, args.out, IndexConfig(),
                              doc_id_col="doc_id", content_col="content")
    else:
        corpus = spark.read.parquet(args.input)
        if "doc_id" in corpus.columns:
            metrics = build_index(spark, corpus, args.out, IndexConfig(),
                                  doc_id_col="doc_id", content_col=args.content_col)
        else:
            metrics = build_index(spark, corpus, args.out, IndexConfig(),
                                  order_cols=("repo", "path", "commit"), content_col=args.content_col)
    for m in metrics:
        print(json.dumps({"stage": m.stage, "rows": m.rows, "seconds": round(m.seconds, 2)}))
    return 0


def cmd_synth(args) -> int:
    from edgesearch_spark.build import IndexConfig, build_index
    from edgesearch_spark.corpus import generate_corpus

    spark = get_session()
    corpus = generate_corpus(spark, args.docs, seed=args.seed)
    metrics = build_index(spark, corpus, args.out, IndexConfig(), order_cols=("repo", "path", "commit"))
    for m in metrics:
        print(json.dumps({"stage": m.stage, "rows": m.rows, "seconds": round(m.seconds, 2)}))
    return 0


def cmd_search(args) -> int:
    from edgesearch_spark.app import SearchApp

    spark = get_session()
    app = SearchApp(spark, args.index)
    resp = app.handle_search(args.url, scored=args.scored)
    print(resp.body)
    return 0 if resp.status == 200 else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="edgesearch_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--format", choices=["parquet", "nul"], default="parquet")
    b.add_argument("--content-col", default="content")
    s = sub.add_parser("synth")
    s.add_argument("--docs", type=int, default=10000)
    s.add_argument("--seed", type=int, default=42)
    s.add_argument("--out", required=True)
    q = sub.add_parser("search")
    q.add_argument("--index", required=True)
    q.add_argument("--url", required=True)
    q.add_argument("--scored", action="store_true")
    args = p.parse_args(argv)
    return {"build": cmd_build, "synth": cmd_synth, "search": cmd_search}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
