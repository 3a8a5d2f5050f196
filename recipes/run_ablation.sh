#!/bin/bash
# GAN-vs-MSE-vs-baseline ablation at non-toy scale — the reference's core
# claim (README.md:5,36-48: LSGAN training beats plain MSE regression for
# dereverberation) demonstrated end-to-end through this framework.
#
#   synth speech (~hours, pseudo-phone content with ground-truth frame
#   alignments) -> cli.simulate (reverb+noise) -> LPS features
#   -> train res_lstm_l with (a) the flagship LSGAN schedule
#      (run_gan_rnn_placeholder.sh:119-168: warm-up epoch at d_lr 1e-3,
#      main run at d_lr 3e-4, g_lr 8e-5, 1 D : 2 G updates, mse_weight 10,
#      disc noise 0.05, B=8) and (b) plain MSE (run_rnn.sh:125-145:
#      g_lr 3e-4, 20-25 epochs, same G) on the SAME corpus
#   -> decode the SAME held-out set with every system
#   -> resynthesize waveforms (enhanced LPS + noisy phase)
#   -> score: feature-MSE, LSD, GV, SI-SNR, STOI, ESTOI AND the
#      recognition proxy (tools/proxy_asr.py: frame classifier trained on
#      clean features, FER/SER on each system's features — the in-image
#      stand-in for the paper's WER axis, README.md:45-48)
#   -> ablation.md / ablation.json.
#
# Sweeps (round-4 VERDICT #3/#4):
#   SEEDS="777 778"       train each system at several seeds; the table
#                         aggregates mean ± half-range rows
#   MSE_WEIGHTS="1 3 10"  GAN runs at several adversarial/MSE balances
#                         (run_gan_rnn_placeholder.sh:133 fixes 10.0)
# The first seed with weight 10 is the canonical "gan" system (quality
# gate applies to it); other combos become extra table rows.
#
# Training is LPS->LPS (input 257-d LPS of corrupted audio -> clean 257-d
# LPS) so the decode output is invertible to a waveform and intelligibility
# metrics apply; the reference's native LPS->MFCC configuration is
# exercised by recipes/run_ablation_mfcc.sh.
#
# One TPU chip. Default scale: 4000 utts (~3.9 h audio, ~1.4M frames).
set -euo pipefail
cd "$(dirname "$0")/.."

workdir=${1:-/tmp/rsrgan_ablation}
num_utts=${2:-4000}
val_size=${3:-200}
gan_epochs=${4:-"18 20"}    # min max for the main GAN run
mse_epochs=${5:-"20 25"}    # min max for the MSE run
stage=${stage:-0}
stop_stage=${stop_stage:-8}   # run stages in [stage, stop_stage]
seeds=${SEEDS:-777}
weights=${MSE_WEIGHTS:-10}
# GAN_COND=1 adds a "gan_cond" system: the flagship schedule with the
# JOINT conditioned discriminator (--d_conditioned: D sees
# concat(inputs, labels/G)) that the reference sketched but left
# commented out (gan_rnn_placeholder.py:192-213) — trained at the first
# seed / weight 10 and scored as an extra table row.
gan_cond=${GAN_COND:-0}
first_seed=$(set -- $seeds; echo "$1")
train_dir=$workdir/data/train
# TPU client handoff gap (CLAUDE.md tunnel quirk); raise when CPU-heavy
# work runs concurrently with the TPU stages (teardown can outlast 15 s
# under host contention and wedge the tunnel server-side)
handoff=${TPU_HANDOFF_SLEEP:-15}


tpu_retry() {  # run a TPU CLI; on failure, probe the tunnel back to
  # health and retry ONCE (handoff stalls wedge ~once per hour of
  # handoffs on this host — CLAUDE.md "Machine quirks")
  "$@" && return 0
  local rc=$?
  echo "[tpu_retry] exit $rc — probing tunnel before one retry" >&2
  for i in $(seq 1 12); do
    sleep 45
    timeout 75 python -c "import jax.numpy as jnp; print(float(jnp.ones(())+1))" \
      >/dev/null 2>&1 && break
  done
  sleep 30
  "$@"
}

gan_sys() {  # gan_sys WEIGHT SEED -> system name
  if [ "$1" = "10" ] && [ "$2" = "$first_seed" ]; then echo gan
  else echo "gan_w$1_s$2"; fi
}
# the sweep grid is a cross in weight x seed, not a full product: weights
# are swept at the first seed (objective-balance curve), seeds at the
# reference weight 10 (variance of the canonical systems)
gan_combo_skip() { [ "$2" != "$first_seed" ] && [ "$1" != "10" ]; }
mse_sys() {  # mse_sys SEED
  if [ "$1" = "$first_seed" ]; then echo mse; else echo "mse_s$1"; fi
}
sys_dir() { echo "$workdir/exp/$1_res_lstm_l"; }
gan_dir=$(sys_dir gan)
mse_dir=$(sys_dir mse)

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  rm -rf "$workdir" && mkdir -p "$train_dir"
  echo "== stage 0: synthesize phone-content speech + rooms/noises =="
  python - "$workdir" "$num_utts" <<'EOF'
import sys
from rsrgan_tpu.sim import make_sim_assets
make_sim_assets(sys.argv[1] + "/sim", num_utts=int(sys.argv[2]),
                min_dur_s=2.0, max_dur_s=5.0,
                num_rooms=4, rirs_per_room=3, seed=37, alignments=True)
EOF
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "== stage 1: corrupt (reverb + noise) =="
  python -m rsrgan_tpu.cli.simulate \
    --wav_scp=$workdir/sim/clean/wav.scp \
    --rir_list=$workdir/sim/rir_list \
    --noise_list=$workdir/sim/noise_list \
    --output_dir=$workdir/sim/rvb \
    --foreground_snrs=5:20 --background_snrs=5:20 \
    --random_seed=1
  sleep 15   # full tunnel release before the next TPU client
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "== stage 2: LPS features on both sides =="
  python -m rsrgan_tpu.cli.extract \
    --wav_scp=$workdir/sim/rvb/wav.scp --feat_type=spectrogram \
    --output_dir=$train_dir --name=inputs --accumulate_cmvn
  sleep 15
  python -m rsrgan_tpu.cli.extract \
    --wav_scp=$workdir/sim/clean/wav.scp --feat_type=spectrogram \
    --output_dir=$train_dir --name=labels --accumulate_cmvn
  sleep 15
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "== stage 3: cmvn + split + stores =="
  python -m rsrgan_tpu.cli.prepare cmvn \
    --inputs=$train_dir/inputs.cmvn --labels=$train_dir/labels.cmvn \
    --save_dir=$train_dir
  python -m rsrgan_tpu.cli.prepare split --val_size=$val_size \
    --data_dir=$train_dir --seed=1
  mkdir -p $train_dir/stores
  for sub in tr cv; do
    python -m rsrgan_tpu.cli.prepare make-store \
      --inputs=$train_dir/$sub/inputs.scp \
      --labels=$train_dir/$sub/labels.scp \
      --cmvn_dir=$train_dir --output_dir=$train_dir/stores --name=$sub
  done
  echo "$train_dir/stores/tr.rtu" > $train_dir/tr.list
  echo "$train_dir/stores/cv.rtu" > $train_dir/cv.list
  python -m rsrgan_tpu.cli.prepare make-store --test \
    --inputs=$train_dir/cv/inputs.scp --cmvn_dir=$train_dir \
    --output_dir=$train_dir/stores --name=test
  echo "$train_dir/stores/test.rtu" > $train_dir/test.list
fi

# Shared generator/data flags (flagship dims, LPS->LPS). LSTM_IMPL=scan
# enables a chip-free fallback run (RSRGAN_PLATFORM=cpu): the pallas
# wavefront stack needs the TPU, the scan cell runs anywhere.
lstm_impl=${LSTM_IMPL:-wavefront}
common_flags="--g_type=res_lstm_l --data_dir=$train_dir
  --tr_list_file=$train_dir/tr.list --cv_list_file=$train_dir/cv.list
  --input_dim=257 --output_dim=257 --left_context=0 --right_context=0
  --batch_size=8 --batch_norm=False --keep_prob=1.0 --l2_scale=0.0
  --end_improve=0.001 --lstm_impl=$lstm_impl"

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "== stage 4: train flagship LSGAN (warm-up + main) per seed/weight =="
  set -- $gan_epochs; gmin=$1; gmax=$2
  for s in $seeds; do for w in $weights; do
    gan_combo_skip $w $s && continue
    name=$(gan_sys $w $s); dir=$(sys_dir $name)
    [ -f "$dir/DONE" ] && { echo "-- GAN system $name already done --"; continue; }
    echo "-- GAN system $name (mse_weight=$w seed=$s) --"
    for cfg in "0.001 1 1" "0.0003 $gmin $gmax"; do
      set -- $cfg
      sleep $handoff
      tpu_retry python -m rsrgan_tpu.cli.train \
        --trainer=gan_rnn $common_flags \
        --save_dir=$dir --seed=$s \
        --g_learning_rate=0.00008 --d_learning_rate=$1 \
        --disc_updates=1 --gen_updates=2 \
        --init_mse_weight=$w --init_disc_noise_std=0.05 \
        --min_epoches=$2 --max_epoches=$3
    done
    touch "$dir/DONE"
  done; done
  if [ "$gan_cond" = "1" ] && [ ! -f "$(sys_dir gan_cond)/DONE" ]; then
    dir=$(sys_dir gan_cond)
    echo "-- GAN system gan_cond (conditioned D, mse_weight=10, seed=$first_seed) --"
    for cfg in "0.001 1 1" "0.0003 $gmin $gmax"; do
      set -- $cfg
      sleep $handoff
      tpu_retry python -m rsrgan_tpu.cli.train \
        --trainer=gan_rnn $common_flags \
        --save_dir=$dir --seed=$first_seed --d_conditioned=true \
        --g_learning_rate=0.00008 --d_learning_rate=$1 \
        --disc_updates=1 --gen_updates=2 \
        --init_mse_weight=10 --init_disc_noise_std=0.05 \
        --min_epoches=$2 --max_epoches=$3
    done
    touch "$dir/DONE"
  fi
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "== stage 5: train MSE baseline (same G, run_rnn.sh schedule) =="
  set -- $mse_epochs; mmin=$1; mmax=$2
  for s in $seeds; do
    name=$(mse_sys $s); dir=$(sys_dir $name)
    [ -f "$dir/DONE" ] && { echo "-- MSE system $name already done --"; continue; }
    echo "-- MSE system $name (seed=$s) --"
    sleep $handoff
    tpu_retry python -m rsrgan_tpu.cli.train \
      --trainer=rnn $common_flags \
      --save_dir=$dir --seed=$s \
      --g_learning_rate=0.0003 \
      --min_epoches=$mmin --max_epoches=$mmax
    touch "$dir/DONE"
  done
fi

all_systems() {  # every trained system: "name trainer dir" lines
  for s in $seeds; do for w in $weights; do
    gan_combo_skip $w $s && continue
    echo "$(gan_sys $w $s) gan_rnn $(sys_dir $(gan_sys $w $s))"
  done; done
  for s in $seeds; do
    echo "$(mse_sys $s) rnn $(sys_dir $(mse_sys $s))"
  done
  [ "$gan_cond" = "1" ] && echo "gan_cond gan_rnn $(sys_dir gan_cond)"
  true
}

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "== stage 6: decode the held-out set with every system =="
  all_systems | while read -r name trainer dir; do
    sleep $handoff
    tpu_retry python -m rsrgan_tpu.cli.train \
      --decode --trainer=$trainer --g_type=res_lstm_l \
      --data_dir=$train_dir --test_list_file=$train_dir/test.list \
      --save_dir=$dir \
      --input_dim=257 --output_dim=257 --batch_size=1 \
      --decode_batch_size=8 --lstm_impl=$lstm_impl
  done
fi

if [ "$stage" -le 7 ] && [ "$stop_stage" -ge 7 ]; then
  echo "== stage 7: resynthesize + score + recognition proxy =="
  awk 'NR==FNR {keep[$1]=1; next} ($1 in keep)' \
    $train_dir/cv/inputs.scp $workdir/sim/rvb/wav.scp \
    > $workdir/cv_noisy_wav.scp
  awk 'NR==FNR {keep[$1]=1; next} ($1 in keep)' \
    $train_dir/cv/inputs.scp $workdir/sim/clean/wav.scp \
    > $workdir/cv_clean_wav.scp
  # baseline (no enhancement) scores
  python -m rsrgan_tpu.cli.score --mode feats \
    --est_scp=$train_dir/cv/inputs.scp --ref_scp=$train_dir/cv/labels.scp \
    --per_utt=$workdir/feats_noisy.jsonl > /dev/null
  python -m rsrgan_tpu.cli.score --mode wav \
    --est_scp=$workdir/cv_noisy_wav.scp --ref_scp=$workdir/cv_clean_wav.scp \
    --per_utt=$workdir/wav_noisy.jsonl > /dev/null
  proxy_evals="--eval noisy=$train_dir/cv/inputs.scp"
  all_systems | while read -r name trainer dir; do
    python -m rsrgan_tpu.cli.resynth \
      --enhanced_scp=$dir/test/feats.scp \
      --wav_scp=$workdir/cv_noisy_wav.scp \
      --out_dir=$dir/test/wav
    python -m rsrgan_tpu.cli.score --mode feats \
      --est_scp=$dir/test/feats.scp --ref_scp=$train_dir/cv/labels.scp \
      --per_utt=$workdir/feats_$name.jsonl > /dev/null
    python -m rsrgan_tpu.cli.score --mode wav \
      --est_scp=$dir/test/wav/wav.scp --ref_scp=$workdir/cv_clean_wav.scp \
      --per_utt=$workdir/wav_$name.jsonl > /dev/null
  done
  # recognition proxy: classifier on clean TRAIN features, scored on the
  # held-out set for {clean ceiling, noisy, every trained system}
  while read -r name trainer dir; do
    proxy_evals="$proxy_evals --eval $name=$dir/test/feats.scp"
  done < <(all_systems)
  sleep $handoff
  tpu_retry python tools/proxy_asr.py \
    --train_scp=$train_dir/tr/labels.scp \
    --ali_scp=$workdir/sim/ali.scp \
    --holdout_scp=$train_dir/cv/labels.scp \
    $proxy_evals --batch=16384 \
    --out=$workdir/proxy.json
fi

if [ "$stop_stage" -lt 8 ]; then echo "stopped at stop_stage=$stop_stage"; exit 0; fi
echo "== stage 8: ablation table =="
extra_args=()
for s in $seeds; do for w in $weights; do
  gan_combo_skip $w $s && continue
  name=$(gan_sys $w $s)
  [ "$name" = "gan" ] || extra_args+=("--extra=$name:LSGAN(w=$w,seed=$s)")
done; done
for s in $seeds; do
  name=$(mse_sys $s)
  [ "$name" = "mse" ] || extra_args+=("--extra=$name:MSE(seed=$s)")
done
[ "$gan_cond" = "1" ] && \
  extra_args+=("--extra=gan_cond:LSGAN+condD(w=10,seed=$first_seed)")
nseeds=$(set -- $seeds; echo $#)
if [ "$nseeds" -gt 1 ]; then
  gan_members=$(for s in $seeds; do gan_sys 10 $s; done | paste -sd, -)
  mse_members=$(for s in $seeds; do mse_sys $s; done | paste -sd, -)
  extra_args+=("--aggregate=LSGAN mean±spread ($nseeds seeds):$gan_members")
  extra_args+=("--aggregate=MSE mean±spread ($nseeds seeds):$mse_members")
fi
python tools/ablation_table.py "$workdir" \
  --train_dir="$train_dir" --gan_dir="$gan_dir" --mse_dir="$mse_dir" \
  ${extra_args[@]+"${extra_args[@]}"}