"""Reference-parity CLI (BytesProcessor.py:357-420): the reference's
only user-facing entry point is a ``__main__`` block that builds an
attack-details config (CICIDS2017 Thursday working hours), constructs
the processor, runs ``process_pcap``, and prints the elapsed
wall-clock.  This module is the same config-and-run shape over the
Spark pipeline:

    python -m bytesprocessor_spark process-pcap CAP.pcap OUT_DIR \
        [--attacks attacks.json] [--ranges from-attacks|all] \
        [--chunk-size 20000] [--widen]

``attacks.json`` uses the REFERENCE's own config schema verbatim
(BytesProcessor.py:22-33)::

    {"attacks": [{"timestamp_range": [start, end],
                  "attacker_ips": ["172.16.0.1"],
                  "victim_ips": ["192.168.10.50"],
                  "label": "Bruteforce"}]}

so a reference user's existing attack-details file drops in
unchanged.  ``--ranges from-attacks`` mirrors the reference's default
(`ranges_to_extract = [attack["timestamp_range"] ...]`); ``all``
extracts every packet.  Output layout matches the reference: a
``data/`` parquet (labeled packets in range) and an ``adversarial/``
parquet (the attacker-sourced subset).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parse_attacks(path: str | None):
    """attacks.json (reference schema) -> tuple[AttackSpec, ...]."""
    from bytesprocessor_spark.operators.labeling import AttackSpec

    if path is None:
        return ()
    with open(path) as f:
        cfg = json.load(f)
    specs = []
    for a in cfg.get("attacks", []):
        ts0, ts1 = a["timestamp_range"]
        specs.append(
            AttackSpec(
                float(ts0),
                float(ts1),
                a.get("label", "Attack"),
                tuple(a.get("attacker_ips", ())),
                tuple(a.get("victim_ips", ())),
            )
        )
    return tuple(specs)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m bytesprocessor_spark",
        description="PySpark-native BytesProcessor: pcap -> labeled parquet.",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    pp = sub.add_parser(
        "process-pcap",
        help="convert a pcap capture to labeled feature parquet "
        "(data/ + adversarial/), the reference's process_pcap run",
    )
    pp.add_argument("pcap_path")
    pp.add_argument("output_dir")
    pp.add_argument(
        "--attacks",
        default=None,
        metavar="JSON",
        help="attack-details JSON in the reference's schema "
        "(BytesProcessor.py:22-33)",
    )
    pp.add_argument(
        "--ranges",
        default="from-attacks",
        choices=["from-attacks", "all"],
        help="time ranges to extract: the attack windows (reference "
        "default) or the whole capture",
    )
    pp.add_argument(
        "--chunk-size",
        type=int,
        default=20000,
        help="packets per parse task (reference chunk_size, "
        "BytesProcessor.py:16)",
    )
    pp.add_argument(
        "--widen",
        action="store_true",
        help="write the reference's 1525 byte(i) columns instead of "
        "one array column",
    )
    pp.add_argument(
        "--no-quality-check",
        action="store_true",
        help="skip the in-flight no-NaN invariant observation",
    )

    lq = sub.add_parser(
        "list-queries",
        help="list every registry query (the SURVEY §2 operator corpus)",
    )
    lq.add_argument(
        "--prefix", default=None, help="only names starting with PREFIX"
    )

    qp = sub.add_parser(
        "query",
        help="run one registry query against a fixture directory and "
        "print the result",
    )
    qp.add_argument("name")
    qp.add_argument(
        "--sf",
        default="/root/testdata/sf0.001",
        help="fixture directory with the standard parquet tables",
    )
    qp.add_argument("--limit", type=int, default=20, help="rows to show")

    args = parser.parse_args(argv)

    if args.command == "list-queries":
        from bytesprocessor_spark.queries import ORACLE, QUERIES

        for name in QUERIES:
            if args.prefix and not name.startswith(args.prefix):
                continue
            tag = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    if args.command == "query":
        from bytesprocessor_spark.queries import QUERIES
        from bytesprocessor_spark.session import get_spark

        if args.name not in QUERIES:
            print(f"unknown query {args.name!r} — see list-queries", file=sys.stderr)
            return 2
        spark = get_spark("bytesprocessor-cli")
        df = QUERIES[args.name](spark, args.sf)
        df.show(args.limit, truncate=False)
        return 0

    if args.command == "process-pcap":
        from bytesprocessor_spark.operators.labeling import AttackSpec  # noqa: F401
        from bytesprocessor_spark.pipeline import process_pcap
        from bytesprocessor_spark.session import get_spark

        attacks = _parse_attacks(args.attacks)
        if args.ranges == "from-attacks" and attacks:
            ranges = tuple((a.ts_start, a.ts_end) for a in attacks)
        else:
            if args.ranges == "from-attacks":
                # the reference derives ranges from the attack list;
                # with no attacks config that list is empty — make the
                # whole-capture fallback explicit instead of silent
                print(
                    "no attacks config given: extracting the WHOLE "
                    "capture (pass --attacks for attack-window "
                    "extraction)",
                    file=sys.stderr,
                )
            ranges = ()

        spark = get_spark("bytesprocessor-cli")
        start_time = time.time()
        data_dir, adv_dir = process_pcap(
            spark,
            args.pcap_path,
            args.output_dir,
            attacks=attacks,
            ranges=ranges,
            widen=args.widen,
            check_quality=not args.no_quality_check,
            split_packets=args.chunk_size,
        )
        elapsed_time = time.time() - start_time
        # the reference prints exactly this line at the end of its run
        print(f"Elapsed Time: {elapsed_time:.2f} seconds")
        print(f"data: {data_dir}")
        print(f"adversarial: {adv_dir}")
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
