#!/bin/bash
# Round-5 capture queue: serial, idle host assumed, one JSON line each.
cd /root/repo
set -x
timeout 3600 python scripts/perf_round3.py hlc        > perf_logs/hlc_r5.json        2> perf_logs/hlc_r5.err
timeout 2400 python scripts/perf_round5.py vc         > perf_logs/vc_r5.json         2> perf_logs/vc_r5.err
timeout 3600 python scripts/perf_round5.py bslmm_rate > perf_logs/bslmm_rate_r5.json 2> perf_logs/bslmm_rate_r5.err
timeout 3600 python scripts/perf_round5.py lmm10k     > perf_logs/lmm10k_r5.json     2> perf_logs/lmm10k_r5.err
timeout 3600 python scripts/perf_round3.py eigen20k_rd > perf_logs/eigen20k_rd_warm_r5.json 2> perf_logs/eigen20k_rd_warm_r5.err
echo ALL_DONE
