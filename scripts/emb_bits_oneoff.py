"""One-off: emb_dedup pair+cluster pipeline at sf30/sf50 with 16 LSH
planes instead of the registry query's 8, demonstrating the documented
scale knob (operators/similarity.py: more planes -> smaller buckets).
Different blocking = different pair semantics, so this is NOT the
oracle-pinned registry query — it measures the knob, not correctness."""
import sys, time, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from micromegas_spark.session import get_spark
from micromegas_spark.operators import similarity
from micromegas_spark.operators.graph import dedup_clusters
from micromegas_spark.sources.tables import load_table

sf_dir = sys.argv[1]
dims = [1 + 4 * i for i in range(16)]  # stride-4: 16 planes, 65536 buckets
spark = get_spark("emb-bits-oneoff")
e = load_table(spark, sf_dir, "embeddings")
t0 = time.time()
pairs = similarity.embedding_near_duplicates(e, threshold=0.3, dims=dims).select(
    "id_a", "id_b"
)
out = dedup_clusters(pairs)
n = out.count()
wall = time.time() - t0
print(
    '\n{"oneoff": "emb_dedup_16bit", "sf_dir": "%s", "rows": %d, "wall_sec": %.1f}'
    % (sf_dir, n, wall)
)
spark.stop()
