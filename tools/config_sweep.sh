#!/bin/bash
# Plan-configuration robustness sweep (round-13, VERDICT item 2): every
# oracle answer must be identical under interpreted expressions (whole-stage
# codegen off), with AQE disabled, and at degenerate/cluster-default shuffle
# parallelism. Runs Verify + the DuckDB compare once per cell.
set -u
SF=${1:-/root/testdata/sf0.01}
declare -A CELLS=(
  [codegen_off]="spark.sql.codegen.wholeStage=false;spark.sql.codegen.factoryMode=NO_CODEGEN"
  [aqe_off]="spark.sql.adaptive.enabled=false"
  [shuffle_1]="spark.sql.shuffle.partitions=1"
  [shuffle_200]="spark.sql.shuffle.partitions=200"
  [ansi_off]="spark.sql.ansi.enabled=false"
)
for cell in codegen_off aqe_off shuffle_1 shuffle_200 ansi_off; do
  out=/tmp/verify_sweep_$cell
  rm -rf "$out"
  echo "=== cell $cell: ${CELLS[$cell]}"
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_EXTRA_CONF="${CELLS[$cell]}" \
    sbt -batch "runMain graft.Verify $SF $out" >"/tmp/sweep_$cell.log" 2>&1
  python3 tools/check_oracle.py "$SF" "$out" 2>&1 | tail -2
done
