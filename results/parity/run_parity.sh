#!/bin/bash
# End-to-end MAE parity runs: reference config.yml defaults (250 epochs,
# batch 100) on the reference's own test_data workload, real TPU.
set -u
cd "$(dirname "$0")"
REPO=/root/repo
for M in CGCNN_demo MPNN_demo SchNet_demo MEGNet_demo GCN_demo; do
  d=$M; mkdir -p "$d"; cd "$d"
  echo "=== $M start $(date)"
  timeout 3000 python $REPO/main.py --config_path=$REPO/config.yml \
    --data_path=$REPO/data/test_data --run_mode=Training --model=$M \
    --job_name="parity_$M" --seed=42 --verbosity=50 \
    > run.log 2> run.err
  echo "=== $M exit $? $(date)"
  cd ..
done
for M in SM_demo SOAP_demo; do
  d=$M; mkdir -p "$d"; cd "$d"
  echo "=== $M start $(date)"
  python - <<PYEOF
import yaml
cfg = yaml.safe_load(open("$REPO/config.yml"))
key = "SM_descriptor" if "$M" == "SM_demo" else "SOAP_descriptor"
cfg["Processing"][key] = "True"
yaml.safe_dump(cfg, open("config_desc.yml", "w"))
PYEOF
  timeout 3000 python $REPO/main.py --config_path=config_desc.yml \
    --data_path=$REPO/data/test_data --run_mode=Training --model=$M \
    --job_name="parity_$M" --seed=42 --verbosity=50 --reprocess=True \
    > run.log 2> run.err
  echo "=== $M exit $? $(date)"
  cd ..
done
echo ALL_DONE
