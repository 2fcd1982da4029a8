#!/bin/bash
# Shared-vocab decade sweep for the co-occurrence graph quartet (r12 verdict
# ask #3): the default ScaleGen token-suffix rule keeps df at BASE level while
# N grows, so the >=20%-df graph is EMPTY at sf>=1 and the quartet's decade
# rows measure only the derivation. This sweep regenerates the documents
# table in `shared` mode (one token pool: df scales with N, the graph is the
# base corpus's non-empty edge set at every scale), symlinks every other
# table from the suffix-mode corpus (byte-identical between modes), runs the
# quartet at sf0.1/sf1/sf10 with the sweep methodology, and reports the edge
# count actually exercised at each scale.
#
# Usage: tools/shared_vocab_sweep.sh [workdir(base suffix corpora)] [outdir]
set -euo pipefail
W="${1:-/tmp/scale}"
S="${2:-/tmp/scale_shared}"
Q="q_graph_degree,q_graph_triangles,q_text_rank,q_recursive_cte"
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $OPENS -Xmx80g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
mkdir -p "$S"

gen() { # gen <srcdir> <dstdir>
  if [ ! -f "$2/documents.parquet/_SUCCESS" ]; then
    mkdir -p "$2"
    SPARK_GRAFT_CPUS=28 SPARK_GRAFT_TABLES=documents \
      $JAVA graft.ScaleGen "$1" "$2" 10 shared
  fi
}
link_rest() { # link_rest <suffixdir> <shareddir>
  for t in region nation customer supplier part orders lineitem events embeddings; do
    [ -e "$2/$t.parquet" ] || ln -s "$1/$t.parquet" "$2/$t.parquet"
  done
}

gen /root/testdata/sf0.1 "$S/sf1";  link_rest "$W/sf1"  "$S/sf1"
gen "$S/sf1"             "$S/sf10"; link_rest "$W/sf10" "$S/sf10"

for sf in sf0.1 sf1 sf10; do
  case $sf in
    sf0.1) DIR=/root/testdata/sf0.1; SP=28;;
    sf1)   DIR="$S/sf1";             SP=28;;
    sf10)  DIR="$S/sf10";            SP=56;;
  esac
  mkdir -p "$S/out_$sf"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=28 SPARK_GRAFT_RUNS=1 \
  SPARK_GRAFT_WARMUP=0 SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_OUT="$S/out_$sf" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$SP \
    $JAVA graft.Bench
done

python3 - "$S" <<'EOF'
import duckdb, json, sys
S = sys.argv[1]
out = {"mode": "shared-vocab (ScaleGen `shared`): replicas keep text verbatim, "
               "df scales with N, the >=20%-df co-occurrence graph is the base "
               "corpus's non-empty edge set at every scale"}
for sf, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", f"{S}/sf1"), ("sf10", f"{S}/sf10")):
    con = duckdb.connect(); con.execute("SET threads=8")
    docs = f"'{d}/documents.parquet/*.parquet'" if sf != "sf0.1" else f"'{d}/documents.parquet'"
    edges, vocab, ndocs = con.execute(f"""
      WITH dt AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
                  FROM {docs}),
      tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM dt),
      freq AS (SELECT token FROM dt GROUP BY token
               HAVING COUNT(*) * 5 >= (SELECT n FROM tot)),
      pr AS (SELECT a.token AS ta, b.token AS tb
             FROM (SELECT * FROM dt JOIN freq USING (token)) a
             JOIN (SELECT * FROM dt JOIN freq USING (token)) b
               ON a.doc_id = b.doc_id AND a.token < b.token),
      ed AS (SELECT ta, tb FROM pr GROUP BY ta, tb
             HAVING COUNT(*) * 5 >= (SELECT n FROM tot))
      SELECT (SELECT COUNT(*) FROM ed),
             (SELECT COUNT(*) FROM freq),
             (SELECT n FROM tot)""").fetchone()
    wall = json.load(open(f"{S}/out_{sf}/BENCH_LOCAL.json"))
    io = json.load(open(f"{S}/out_{sf}/BENCH_IO.json"))
    out[sf] = {"n_docs": ndocs, "frequent_tokens": vocab, "cooccur_edges": edges,
               "wall_sec": wall, "io": io}
json.dump(out, open("/root/repo/SCALE_SHARED.json", "w"), indent=1)
print(json.dumps({k: (v if not isinstance(v, dict) else
      {x: v[x] for x in v if x != 'io'}) for k, v in out.items()}, indent=1))
EOF
