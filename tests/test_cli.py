"""Reference-parity CLI (python -m bytesprocessor_spark): the module
entry point mirrors the reference's __main__ config-and-run shape
(BytesProcessor.py:357-420) — attacks JSON in the reference's own
schema, process-pcap over the golden fixture, data/ + adversarial/
parquet out, elapsed wall-clock printed."""

import json

from bytesprocessor_spark.__main__ import _parse_attacks, main

from test_pcap import ATTACKS, make_fixture_pcap


def _attacks_json(path):
    """The reference's attack_details schema, verbatim keys."""
    cfg = {
        "attacks": [
            {
                "timestamp_range": [a.ts_start, a.ts_end],
                "attacker_ips": list(a.attacker_ips),
                "victim_ips": list(a.victim_ips),
                "label": a.label,
            }
            for a in ATTACKS
        ]
    }
    path.write_text(json.dumps(cfg))
    return str(path)


def test_parse_attacks_reference_schema(tmp_path):
    specs = _parse_attacks(_attacks_json(tmp_path / "attacks.json"))
    assert specs == ATTACKS


def test_cli_process_pcap_golden(spark, tmp_path, capsys):
    pcap = str(tmp_path / "cap.pcap")
    make_fixture_pcap(pcap)
    out = str(tmp_path / "out")
    rc = main(
        [
            "process-pcap",
            pcap,
            out,
            "--attacks",
            _attacks_json(tmp_path / "attacks.json"),
            "--chunk-size",
            "6",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "Elapsed Time:" in printed  # the reference's closing line

    # --ranges from-attacks (default) = the reference's
    # ranges_to_extract = attack windows; same rows as the e2e test
    data = spark.read.parquet(f"{out}/data").collect()
    assert sorted(round(r.timestamp, 1) for r in data) == [
        1000.5, 1001.0, 1002.0, 1006.0, 1007.0, 1008.0, 1009.0, 2000.0,
    ]
    labels = {round(r.timestamp, 1): r.label for r in data}
    assert labels[1000.5] == "bruteforce" and labels[2000.0] == "infiltration"
    adv = spark.read.parquet(f"{out}/adversarial").collect()
    assert sorted(round(r.timestamp, 1) for r in adv) == [1000.5, 1009.0, 2000.0]


def test_cli_ranges_all_no_attacks(spark, tmp_path):
    pcap = str(tmp_path / "cap.pcap")
    make_fixture_pcap(pcap)
    out = str(tmp_path / "all")
    rc = main(["process-pcap", pcap, out, "--ranges", "all", "--no-quality-check"])
    assert rc == 0
    data = spark.read.parquet(f"{out}/data").collect()
    # every parseable IPv4 TCP/UDP packet (9 of the 12 fixture frames)
    assert len(data) == 9
    assert {r.label for r in data} == {"benign"}


def test_cli_list_queries(capsys):
    rc = main(["list-queries", "--prefix", "q1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out


def test_cli_query_runs_registry_entry(spark, capsys):
    rc = main(["query", "q1_pricing_summary", "--sf", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sum_qty" in out and "count_order" in out


def test_cli_query_unknown_name(capsys):
    rc = main(["query", "no_such_query"])
    assert rc == 2
