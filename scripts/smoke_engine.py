"""Dev smoke: run the engine on the parity fixture and diff vs simulator."""
import time

from pyspark.sql import SparkSession

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.simulator import ReferenceSimulator, pages_df_to_dict
from webcrawler_spark.sources.synthetic_web import SEEDS, build_pages, seeds_df

spark = (
    SparkSession.builder.master("local[8]").config("spark.driver.memory", "4g")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

pages = build_pages(spark).cache()
sim = ReferenceSimulator(pages_df_to_dict(pages.collect()))
simres = sim.run(SEEDS)
print("SIM: attempts=%d fetched=%d hosts=%d" % (
    len(simres.attempt_order), len(simres.fetch_order), len(simres.host_counts)))

t0 = time.time()
eng = CrawlEngine(spark, pages, config=CrawlConfig(max_rounds=40))
hist = eng.run(seeds_df(spark), verbose=True)
print("BSP rounds=%d wall=%.1fs" % (len(hist), time.time() - t0))

seen = {r["url"]: r["fetched"] for r in eng.seen().collect()}
print("ENG: attempts=%d fetched=%d" % (len(seen), sum(seen.values())))

sim_seen = simres.seen
only_sim = set(sim_seen) - set(seen)
only_eng = set(seen) - set(sim_seen)
print("only_sim:", sorted(only_sim)[:10])
print("only_eng:", sorted(only_eng)[:10])
mismatch_flag = {u for u in set(seen) & set(sim_seen) if seen[u] != sim_seen[u]}
print("fetched-flag mismatches:", sorted(mismatch_flag)[:10])

# text parity
texts = {r["url"]: r["text"] for r in eng.pages_fetched().collect()}
bad = [u for u, t in texts.items() if simres.texts.get(u) != t]
print("text mismatches:", bad[:5])

# ---- sequential order parity -------------------------------------------
print("\n--- sequential parity mode ---")
t0 = time.time()
eng2 = CrawlEngine(spark, pages, config=CrawlConfig.sequential_parity_mode())
eng2.cfg.max_rounds = 60
hist2 = eng2.run(seeds_df(spark))
print("seq rounds=%d wall=%.1fs" % (len(hist2), time.time() - t0))
eng_attempts = [
    (r["url"], r["round"]) for r in eng2.seen().orderBy("round", "url").collect()
]
eng_order = [u for u, _ in sorted(eng_attempts, key=lambda x: x[1])]
sim_order = [u for u, _, _ in simres.attempt_order]
print("eng attempts:", len(eng_order), "sim:", len(sim_order))
for i, (a, b) in enumerate(zip(eng_order, sim_order)):
    if a != b:
        print(f"DIVERGE at {i}: eng={a} sim={b}")
        print("context sim:", sim_order[max(0,i-3):i+3])
        print("context eng:", eng_order[max(0,i-3):i+3])
        break
else:
    print("ORDER MATCH" if len(eng_order) == len(sim_order) else "LENGTH MISMATCH")
