#!/bin/bash
# Decade sweep for newly-added linear-shape queries (round 9 follow-up):
# regenerates the ScaleGen corpora (sf1/sf10/sf100, chained x10) and runs a
# SPARK_GRAFT_ONLY Bench pass at each scale with the sweep methodology
# (RUNS=1 WARMUP=0 local[28]/80g), writing per-scale artifact dirs that
# tools/sf100update.py merges into SCALE_SF100.json.
#
# Usage: tools/span_rate_sweep.sh <query[,query...]> [workdir]
set -euo pipefail
Q="$1"
W="${2:-/tmp/scale}"
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
JAVA="java $OPENS -Xmx80g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
mkdir -p "$W"

if [ ! -d "$W/sf1" ];   then SPARK_GRAFT_CPUS=28 $JAVA graft.ScaleGen /root/testdata/sf0.1 "$W/sf1" 10; fi
if [ ! -d "$W/sf10" ];  then SPARK_GRAFT_CPUS=28 $JAVA graft.ScaleGen "$W/sf1"  "$W/sf10" 10; fi
if [ ! -d "$W/sf100" ]; then SPARK_GRAFT_CPUS=28 $JAVA graft.ScaleGen "$W/sf10" "$W/sf100" 10; fi

# Shuffle partitions scale with the corpus (~2M fact rows per partition),
# as any real deployment sizes them; AQE coalesces the small queries back
# down, so the only effect is that big sorts stop multi-pass spilling.
for sf in sf0.1 sf1 sf10 sf100; do
  case $sf in
    sf0.1)  DIR=/root/testdata/sf0.1; SP=28;;
    sf1)    DIR="$W/sf1";             SP=28;;
    sf10)   DIR="$W/sf10";            SP=56;;
    sf100)  DIR="$W/sf100";           SP=280;;
  esac
  mkdir -p "$W/out_$sf"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=28 SPARK_GRAFT_RUNS=1 \
  SPARK_GRAFT_WARMUP=0 SPARK_GRAFT_ONLY="$Q" SPARK_GRAFT_OUT="$W/out_$sf" \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=$SP \
    $JAVA graft.Bench
done

python3 tools/sf100update.py SCALE_SF100.json \
  "$W/out_sf0.1" "$W/out_sf1" "$W/out_sf10" "$W/out_sf100"
echo "sweep done: $Q"
