#!/bin/bash
# End-to-end MAE parity runs: reference config.yml defaults (250 epochs,
# batch 100) on the reference's own test_data workload, real TPU.
#
# r3: THREE seeds per model (42/43/44) via the CLI, with every run.log
# committed (git add -f — results/ is gitignored for job outputs, parity
# evidence is force-tracked). summarize_parity.py parses the logs into
# summary.json and the PARITY.md table (mean±std).
set -u
cd "$(dirname "$0")"
REPO=/root/repo
SEEDS="42 43 44 45 46"
for M in CGCNN_demo MPNN_demo SchNet_demo MEGNet_demo GCN_demo; do
  for S in $SEEDS; do
    d="$M/seed$S"; mkdir -p "$d"; cd "$d"
    if grep -q "Test Error" run.log 2>/dev/null; then
      echo "=== $M seed $S cached"; cd ../..; continue
    fi
    echo "=== $M seed $S start $(date)"
    timeout 3000 python $REPO/main.py --config_path=$REPO/config.yml \
      --data_path=$REPO/data/test_data --run_mode=Training --model=$M \
      --job_name="parity_$M" --seed=$S --verbosity=10 \
      > run.log 2> run.err
    echo "=== $M seed $S exit $? $(date)"
    rm -f my_model.ckpt my_model_temp.ckpt
    cd ../..
  done
done
for M in SM_demo SOAP_demo; do
  for S in $SEEDS; do
    d="$M/seed$S"; mkdir -p "$d"; cd "$d"
    if grep -q "Test Error" run.log 2>/dev/null; then
      echo "=== $M seed $S cached"; cd ../..; continue
    fi
    echo "=== $M seed $S start $(date)"
    python - <<PYEOF
import yaml
cfg = yaml.safe_load(open("$REPO/config.yml"))
key = "SM_descriptor" if "$M" == "SM_demo" else "SOAP_descriptor"
cfg["Processing"][key] = "True"
yaml.safe_dump(cfg, open("config_desc.yml", "w"))
PYEOF
    timeout 3000 python $REPO/main.py --config_path=config_desc.yml \
      --data_path=$REPO/data/test_data --run_mode=Training --model=$M \
      --job_name="parity_$M" --seed=$S --verbosity=10 --reprocess=True \
      > run.log 2> run.err
    echo "=== $M seed $S exit $? $(date)"
    rm -f my_model.ckpt my_model_temp.ckpt
    cd ../..
  done
done
python $REPO/results/parity/summarize_parity.py
echo ALL_DONE
