"""Entity linking (embedding + blocking) and surface-form clustering."""
import pyarrow as pa
import ray.data

from kgray.stages.cluster import cluster_surface_forms, normalize_surface
from kgray.stages.link import EntityLinker, embed_text, link_mentions


def test_embedder_deterministic_and_discriminative():
    a1, a2 = embed_text("AKT1"), embed_text("AKT1")
    assert (a1 == a2).all()
    assert a1 @ embed_text("akt1") > a1 @ embed_text("insulin")


def test_linker_exact_and_fuzzy():
    lk = EntityLinker(min_score=0.5)
    ent, score = lk.link_one("AKT1")
    assert ent.entry_name == "AKT1" and score > 0.99
    ent2, s2 = lk.link_one("akt1")  # case variant, same block
    assert ent2 is not None and ent2.entry_name == "AKT1"
    ent3, s3 = lk.link_one("xqzzy")  # garbage → unlinked
    assert ent3 is None


def test_link_mentions_distributed():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["d1", "d1", "d2"],
                "span_seq": pa.array([0, 0, 1], pa.int32()),
                "mention": ["TP53", "rapamycin", "nonsense-zz"],
            }
        )
    )
    out = link_mentions(ds, min_score=0.5).to_pandas()
    linked = out.set_index("mention")
    assert linked.loc["TP53", "db"] == "HGNC"
    assert linked.loc["rapamycin", "db"] == "CHEBI"
    assert linked.loc["nonsense-zz", "entry_name"] is None
    assert (out.score >= 0).all()


def test_normalize_surface():
    assert normalize_surface("TP-53 ") == "tp53"
    assert normalize_surface("Akt1") == "akt1"


def test_cluster_surface_forms():
    names = ["TP53", "tp53", "TP-53", "AKT1", "Akt-1", "insulin",
             "Insulin", "rapamycin"]
    ds = ray.data.from_arrow(pa.table({"name": names}))
    df = (cluster_surface_forms(ds, threshold=0.55).to_pandas()
          .sort_values("name").reset_index(drop=True))
    by_name = df.set_index("name")
    tp = {by_name.loc[n, "cluster_id"] for n in ["TP53", "tp53", "TP-53"]}
    akt = {by_name.loc[n, "cluster_id"] for n in ["AKT1", "Akt-1"]}
    ins = {by_name.loc[n, "cluster_id"] for n in ["insulin", "Insulin"]}
    assert len(tp) == 1 and len(akt) == 1 and len(ins) == 1
    assert tp != akt and akt != ins and tp != ins
    assert by_name.loc["rapamycin", "cluster_id"] not in tp | akt | ins
    # canonical = lexicographically smallest member, deterministic
    assert by_name.loc["tp53", "canonical"] == min("TP53", "tp53", "TP-53")
    df2 = (cluster_surface_forms(ds, threshold=0.55).to_pandas()
           .sort_values("name").reset_index(drop=True))
    assert df.equals(df2)
