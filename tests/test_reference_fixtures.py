"""Table-driven parity over the reference's REAL fixture corpus.

The reference ships its actual onboarding payloads —
``data/step_function_inputs/*.json`` (the exact event dicts users feed
the discovery state machine: 19 cmr + 8 inventory + 1 list-wrapped) and
``data/collections/*.json`` (31 real STAC Collection documents the
collection CRUD scripts POST). Earlier rounds drove sample-event SHAPES
through the adapters; this module drives every real payload verbatim:

- each step-function event routes through
  ``pipelines.dispatch_discovery`` against a synthesized substrate (a
  local inventory CSV / granule dump shaped to the event's own keys —
  the one HTTP/S3 fetch the reference performs stays outside, as the
  adapters document) and must yield a non-degenerate file_obj frame;
- the whole corpus onboards in ONE ``run_discovery_spec`` call (the
  declarative config-as-data path, parity with deploy/config.py's
  per-collection loop);
- every real Collection document flows desired-vs-current through
  ``plan_item_changes``/``apply_item_changes(resource="collections")``
  (parity: scripts/collection.py insert path) with a transport that
  validates the POSTed body IS the fixture document.

No code or text is copied from the reference — the fixtures are INPUT
data, read-only, and the assertions pin our adapters' documented
contracts against them.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

COLL_DIR = "/root/reference/data/collections"
EVENT_DIR = "/root/reference/data/step_function_inputs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EVENT_DIR), reason="reference fixture corpus absent"
)


def _load_events() -> list[tuple[str, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(EVENT_DIR, "*.json"))):
        with open(p) as f:
            doc = json.load(f)
        # GEDI_CalVal_Field_Data.json wraps its event in a 1-list (the
        # state machine maps over it); flatten with a stable suffix.
        events = doc if isinstance(doc, list) else [doc]
        for i, e in enumerate(events):
            name = os.path.basename(p) + (f"#{i}" if len(events) > 1 else "")
            out.append((name, e))
    return out


EVENTS = _load_events() if os.path.isdir(EVENT_DIR) else []


def _regex_witness(pattern: str) -> str:
    """A concrete string matching one of the fixtures' product-id
    regexes (alphabet: literals, ``.{n}``, ``.*``, ``-``, ``_``)."""
    s = re.sub(r"\.\{(\d+)\}", lambda m: "a" * int(m.group(1)), pattern)
    s = s.replace(".*", "X")
    assert re.search(pattern, s), f"witness failed for {pattern!r}"
    return s


def _granules_for(spark, event: dict):
    """Synthesize the CMR ``feed.entry`` dump the event's query would
    return: 3 granules, each with a decoy metadata link plus an s3 data
    link (or ``link_rel`` link); multi-asset events get per-product file
    fan-outs that exercise the regroup path."""
    rel = event.get("link_rel") or "http://esipfed.org/ns/fedsearch/1.1/s3#"
    coll = event["collection"]
    rows = []
    dfre = event.get("data_file_regex")
    for g in range(3):
        if dfre:
            pid = _regex_witness(dfre).replace("X", f"g{g}")
            if not re.search(dfre, pid):  # .* witness must still match
                pid = _regex_witness(dfre)
            files = [
                f"s3://bucket/{coll}/{pid}_{event.get('data_file', 'dat')}",
                f"s3://bucket/{coll}/{pid}_extra.bin",
            ]
        else:
            files = [f"s3://bucket/{coll}/granule_{g}.tif"]
        for j, url in enumerate(files):
            rows.append(
                {
                    "id": f"G{g}-{j}.{coll}",
                    "links": [
                        {
                            "rel": "http://esipfed.org/ns/fedsearch/1.1/metadata#",
                            "href": f"https://example.invalid/meta_{g}_{j}.xml",
                        },
                        {"rel": rel, "href": url},
                    ],
                }
            )
    return spark.createDataFrame(
        rows, "id string, links array<struct<rel:string,href:string>>"
    )


def _inventory_csv_for(tmp_path, event: dict) -> str:
    """Synthesize the inventory CSV the event's ``inventory_url`` points
    at: the URL column the adapter defaults to plus whatever
    ``metadata_file_url_key`` column the event names."""
    url_key = event.get("file_url_key", "s3_path")
    cols = [url_key]
    if mk := event.get("metadata_file_url_key"):
        if mk != url_key:
            cols.append(mk)
    coll = event["collection"]
    lines = [",".join(cols)]
    for i in range(4):
        vals = [f"s3://bucket/{coll}/tile_{i}.tif"] + [
            f"s3://bucket/{coll}/tile_{i}.csv" for c in cols[1:]
        ]
        lines.append(",".join(vals))
    p = tmp_path / f"{re.sub(r'[^A-Za-z0-9_.-]', '_', coll)}_inventory.csv"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def _ctx_for(spark, tmp_path, event: dict) -> dict:
    mode = event.get("discovery")
    if mode == "inventory":
        return {"csv_path": _inventory_csv_for(tmp_path, event)}
    if mode == "cmr":
        return {"granules": _granules_for(spark, event)}
    raise AssertionError(f"unexpected fixture discovery mode {mode!r}")


@pytest.mark.parametrize("name,event", EVENTS, ids=[n for n, _ in EVENTS])
def test_every_real_step_function_input_discovers(spark, tmp_path, name, event):
    from maap_data_pipelines_spark.pipelines import dispatch_discovery

    df = dispatch_discovery(spark, event, **_ctx_for(spark, tmp_path, event))
    rows = df.collect()
    assert rows, f"{name}: empty file_obj frame"
    cols = set(df.columns)
    assert {"collection", "remote_fileurl"} <= cols
    for r in rows:
        assert r["collection"] == event["collection"]
        assert r["remote_fileurl"] and r["remote_fileurl"].startswith("s3://")
    # the event's asset enrichment keys propagate verbatim
    for k in event:
        if "asset" in k and k != "metadata_file_url_key":
            assert k in cols, f"{name}: missing propagated {k}"
    if event.get("discovery") == "inventory":
        assert {"product_id", "ingest", "cogify"} <= cols
        if event.get("metadata_file_url_key") and event.get("metadata_type"):
            # canonical 'key=url' rendering, union-compatible with cmr
            assert rows[0]["assets"].startswith(event["metadata_type"] + "=")
        for r in rows:
            assert r["cogify"] == bool(event.get("cogify", False))
            assert r["upload"] == bool(event.get("upload", False))
    if event.get("discovery") == "cmr" and event.get("data_file_regex"):
        # multi-asset regroup: product rows carry the sorted assets map
        assert {"product_id", "assets"} <= cols
        for r in rows:
            assert re.search(event["data_file_regex"], r["product_id"])
            assert "=" in r["assets"] and r["product_id"] in r["assets"]


def test_whole_corpus_onboards_in_one_run_discovery_spec(spark, tmp_path):
    """All 28 real payloads as ONE config-as-data onboarding job."""
    from maap_data_pipelines_spark.pipelines import run_discovery_spec

    spec = [
        {**event, "ctx": _ctx_for(spark, tmp_path, event)}
        for _, event in EVENTS
    ]
    got = run_discovery_spec(spark, spec)
    assert {"collection", "remote_fileurl", "execution"} <= set(got.columns)
    per_coll = {
        r["collection"]: r["n"]
        for r in got.groupBy("collection").count().withColumnRenamed("count", "n").collect()
    }
    for _, event in EVENTS:
        assert per_coll.get(event["collection"], 0) >= 1, event["collection"]
    # one execution lineage value per spec entry (collections are unique
    # except AFRISAR_DLR/AFRISAR_DLR2 which are distinct ids already)
    n_exec = got.select("execution").distinct().count()
    assert n_exec == len({e["collection"] for _, e in EVENTS})


def test_every_real_collection_document_flows_crud(spark):
    """All 31 real Collection docs: desired-vs-empty plan = 31 inserts;
    apply POSTs each body verbatim to /collections (validated by the
    transport), all-200 receipts; re-plan after sync = empty diff."""
    from maap_data_pipelines_spark.sinks import (
        apply_item_changes,
        plan_item_changes,
    )

    paths = sorted(glob.glob(os.path.join(COLL_DIR, "*.json")))
    assert len(paths) >= 30
    docs = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        assert doc["id"] and doc["type"] == "Collection"
        docs.append((doc["id"], json.dumps(doc, sort_keys=True)))
    desired = spark.createDataFrame(
        docs, "collection_id string, collection_json string"
    )
    empty = spark.createDataFrame([], "collection_id string, collection_json string")
    plan = plan_item_changes(
        desired, empty, id_col="collection_id", json_col="collection_json"
    )
    assert plan.filter("op = 'insert'").count() == len(docs)

    def _validating_transport(method: str, path: str, body: str | None) -> int:
        if method != "POST" or not path.endswith("/collections"):
            return 405
        try:
            d = json.loads(body)
        except (TypeError, ValueError):
            return 400
        ok = (
            d.get("type") == "Collection"
            and d.get("id")
            and "extent" in d
            and d.get("stac_version")
        )
        return 200 if ok else 422

    receipts = apply_item_changes(
        plan,
        endpoint="https://api.invalid/",
        transport=_validating_transport,
        resource="collections",
    ).collect()
    assert len(receipts) == len(docs)
    assert all(r["status"] == 200 for r in receipts)
    # idempotence: once current == desired the diff is empty
    current = desired
    assert (
        plan_item_changes(
            desired, current, id_col="collection_id", json_col="collection_json"
        ).count()
        == 0
    )


def test_versioned_table_cdf_over_collection_corpus(spark, tmp_path):
    """Marry the two newest subsystems: the 31 real Collection docs land
    in a VersionedTable, a second version applies one update + one
    delete + one insert via merge_upsert, and changes() emits exactly
    those CDF rows — agreeing row-for-row with what plan_item_changes
    derives from the same two snapshots."""
    from maap_data_pipelines_spark.sinks import plan_item_changes
    from maap_data_pipelines_spark.table import VersionedTable

    paths = sorted(glob.glob(os.path.join(COLL_DIR, "*.json")))
    docs = []
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        docs.append((doc["id"], json.dumps(doc, sort_keys=True)))
    assert len(docs) >= 30
    schema = "collection_id string, collection_json string"
    tbl = VersionedTable(str(tmp_path / "collections_tbl"))
    v1 = tbl.commit(spark.createDataFrame(docs, schema), mode="overwrite")

    # second version: bump one doc's JSON, delete another, add a new one
    upd_id, del_id = docs[0][0], docs[1][0]
    bumped = json.dumps(
        {**json.loads(docs[0][1]), "description": "v2 description"},
        sort_keys=True,
    )
    new_doc = json.dumps(
        {"id": "synthetic-new-collection", "type": "Collection"},
        sort_keys=True,
    )
    updates = spark.createDataFrame(
        [
            (upd_id, bumped, False),
            (del_id, docs[1][1], True),
            ("synthetic-new-collection", new_doc, False),
        ],
        schema + ", is_delete boolean",
    )
    v2 = tbl.merge_upsert(updates, key="collection_id", delete_col="is_delete")

    cdf = tbl.changes(spark, v1, v2, key="collection_id").collect()
    by_type = {}
    for r in cdf:
        by_type.setdefault(r._change_type, []).append(r)
    assert [len(by_type.get(t, [])) for t in (
        "insert", "delete", "update_preimage", "update_postimage"
    )] == [1, 1, 1, 1]
    assert by_type["insert"][0].collection_id == "synthetic-new-collection"
    assert by_type["delete"][0].collection_id == del_id
    assert by_type["update_preimage"][0].collection_json == docs[0][1]
    assert by_type["update_postimage"][0].collection_json == bumped

    # the CDF and the CRUD planner tell the same story about v1 -> v2
    plan = {
        (r.op, r.item_id)
        for r in plan_item_changes(
            tbl.read(spark, v2),
            tbl.read(spark, v1),
            id_col="collection_id",
            json_col="collection_json",
        ).collect()
    }
    assert plan == {
        ("insert", "synthetic-new-collection"),
        ("delete", del_id),
        ("update", upd_id),
    }
    # untouched docs appear in neither feed
    assert len(cdf) == 4
