"""End-to-end per-project prebuild (the reference's main flow): discover →
build versioned dense+sparse indexes with checksum skip → serve hybrid
queries from the stored tables."""

import json

import pyspark.sql.functions as F
import pytest

from darkbo_spark.retrieval.prebuild import (
    prebuild_all,
    prebuild_project,
    project_items,
    query_project,
)


def _mk_data(tmp_path):
    data = tmp_path / "data"
    p1 = data / "101"
    p1.mkdir(parents=True)
    faqs = [
        {
            "id": None,
            "question": "What are the shelter hours?",
            "answer": "The ASPCA shelter is open nine to five on weekdays.",
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "2024-01-01T00:00:00Z",
            "source": "faq",
            "source_file": "101.faq.json",
        },
        {
            "id": None,
            "question": "How do I adopt a dog?",
            "answer": "Fill in the adoption form and visit the shelter.",
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "2024-01-01T00:00:00Z",
            "source": "faq",
            "source_file": "101.faq.json",
        },
    ]
    (p1 / "101.faq.json").write_text(json.dumps(faqs))
    kb = [
        {
            "id": None,
            "article": "Volunteering",
            "content": "Volunteers help with dog walking and cat care every weekend.",
            "created_at": "2024-01-01T00:00:00Z",
            "updated_at": "2024-01-01T00:00:00Z",
            "source": "kb",
            "source_file": "101.kb.json",
            "chunk_index": 0,
        }
    ]
    (p1 / "101.kb.json").write_text(json.dumps(kb))

    p2 = data / "202"
    p2.mkdir(parents=True)
    (p2 / "202.faq.json").write_text(
        json.dumps(
            [
                {
                    "id": None,
                    "question": "What is the refund policy?",
                    "answer": "Refunds are processed within ten business days.",
                    "created_at": "2024-01-01T00:00:00Z",
                    "updated_at": "2024-01-01T00:00:00Z",
                    "source": "faq",
                    "source_file": "202.faq.json",
                }
            ]
        )
    )
    return str(data)


def test_prebuild_builds_then_skips_then_rebuilds_on_change(spark, tmp_path):
    data_dir = _mk_data(tmp_path)
    out_dir = str(tmp_path / "indexes")

    res1 = prebuild_all(spark, data_dir, out_dir)
    assert set(res1) == {"101", "202"}
    assert not res1["101"]["skipped"] and not res1["202"]["skipped"]
    assert set(res1["101"]["versions"]) == {"items", "dense_index", "sparse_postings"}

    # unchanged inputs → every table skips (the reference's needs_rebuild)
    res2 = prebuild_all(spark, data_dir, out_dir)
    assert res2["101"]["skipped"] and res2["202"]["skipped"]
    assert res2["101"]["versions"] == res1["101"]["versions"]

    # touch ONE project's data → only that project republishes
    faq_path = tmp_path / "data" / "202" / "202.faq.json"
    rows = json.loads(faq_path.read_text())
    rows[0]["answer"] = "Refunds are processed within five business days."
    faq_path.write_text(json.dumps(rows))
    res3 = prebuild_all(spark, data_dir, out_dir)
    assert res3["101"]["skipped"] and not res3["202"]["skipped"]
    assert res3["202"]["versions"]["items"] != res1["202"]["versions"]["items"]


def test_project_items_shape(spark, tmp_path):
    data_dir = _mk_data(tmp_path)
    items = project_items(
        spark,
        "101",
        {
            "faq": f"{data_dir}/101/101.faq.json",
            "kb": f"{data_dir}/101/101.kb.json",
        },
    ).collect()
    by_type = {}
    for r in items:
        by_type.setdefault(r.type, []).append(r)
    assert len(by_type["faq"]) == 2 and len(by_type["kb"]) == 1
    # FAQ content is 'question answer' (reference item shape)
    faq = {r.title: r.content for r in by_type["faq"]}
    assert faq["How do I adopt a dog?"].startswith("How do I adopt a dog? Fill in")
    assert by_type["kb"][0].title == "Volunteering"


def test_query_project_hybrid_from_stored(spark, tmp_path):
    data_dir = _mk_data(tmp_path)
    out_dir = str(tmp_path / "indexes")
    prebuild_all(spark, data_dir, out_dir)

    got = query_project(
        spark, out_dir, "101", "how do I adopt a dog", top_k=3
    ).collect()
    assert got, "no results"
    # the adoption FAQ must win, via the dense channel (exact content match
    # → cosine 1-ish beats everything; dense has precedence at equal ids)
    items = {
        r.id: r.title
        for r in __import__(
            "darkbo_spark.storage.snapshots", fromlist=["SnapshotTable"]
        ).SnapshotTable(f"{out_dir}/101", "items").read(spark).collect()
    }
    assert items[got[0].id] == "How do I adopt a dog?"
    assert {r.search_type for r in got} <= {"dense", "sparse", "basic"}
    # one row per id (precedence dedup)
    ids = [r.id for r in got]
    assert len(ids) == len(set(ids))


def test_prebuild_lock_blocks_concurrent_builder(spark, tmp_path):
    from darkbo_spark.storage.snapshots import BuildLock

    data_dir = _mk_data(tmp_path)
    out_dir = str(tmp_path / "indexes")
    base = f"{out_dir}/101"
    import os

    os.makedirs(base, exist_ok=True)
    lock = BuildLock(base, "prebuild")
    assert lock.acquire("other")
    try:
        with pytest.raises(RuntimeError, match="lock"):
            prebuild_project(
                spark,
                "101",
                {
                    "faq": f"{data_dir}/101/101.faq.json",
                    "kb": f"{data_dir}/101/101.kb.json",
                },
                out_dir,
            )
    finally:
        lock.release("other")
