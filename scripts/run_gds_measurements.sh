#!/bin/sh
# On-chip measurements for --guidance_downsample (queued during the round-3
# TPU-relay outage; rerun whenever a chip is available).
#
# Produces:
#   artifacts/round3_perf/bench_colorbatch_gds.jsonl   (throughput incl. gds2)
#   artifacts/round3_perf/guidance_downsample_eval/    (exact vs gds2 summaries)
#
# Run from the repo root. Each stage waits for a healthy TPU first; stages
# are separated by 300 s sleeps for the single-tenant claim to release.
set -x
cd "$(dirname "$0")/.."
probe() {
  timeout 300 python -c "import jax; print(jax.devices()[0].platform)"
}
wait_healthy() {
  while ! probe; do echo "tpu unhealthy $(date)"; sleep 300; done
  sleep 300
}
wait_healthy
PYTHONPATH="$PWD:$PYTHONPATH" python scripts/bench_colorbatch.py 41 \
  | tee /tmp/bench_cb_gds_run.log
grep '^{' /tmp/bench_cb_gds_run.log > artifacts/round3_perf/bench_colorbatch_gds.jsonl
sleep 300; wait_healthy
python -m rich_text_to_image_tpu.evaluation.benchmark_color --random_weights \
  --steps 41 --limit 2 --num_seeds 1 --batch_colors 2 --save_path /tmp/bc_gds1
sleep 300; wait_healthy
python -m rich_text_to_image_tpu.evaluation.benchmark_color --random_weights \
  --steps 41 --limit 2 --num_seeds 1 --batch_colors 2 --guidance_downsample 2 \
  --save_path /tmp/bc_gds2
mkdir -p artifacts/round3_perf/guidance_downsample_eval
cp /tmp/bc_gds1/summary.json artifacts/round3_perf/guidance_downsample_eval/summary_exact.json
cp /tmp/bc_gds2/summary.json artifacts/round3_perf/guidance_downsample_eval/summary_gds2.json
