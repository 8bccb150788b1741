

def test_media_exact_dedup_byte_identity(spark):
    from pyspark.sql import functions as F

    from embed_rerank_spark.operators.multimodal import (
        generate_fake_media,
        media_exact_dedup,
    )

    base = generate_fake_media(spark, 20)
    # duplicate payloads under new ids: 100+i carries i's exact bytes
    dup = base.filter(F.col("media_id") < 5).select(
        (F.col("media_id") + 100).alias("media_id"),
        "kind", "payload", "mime", "width", "height", "duration_ms",
    )
    got = {r["media_id"]: r for r in media_exact_dedup(base.unionByName(dup)).collect()}
    assert len(got) == 25
    for i in range(5):
        assert got[100 + i]["canonical"] == i  # min id survives
        assert bool(got[100 + i]["is_canonical"]) is False
        assert got[100 + i]["n_copies"] == 2
        assert bool(got[i]["is_canonical"]) is True
    for i in range(5, 20):  # unique payloads are their own canonical
        assert got[i]["canonical"] == i and got[i]["n_copies"] == 1
