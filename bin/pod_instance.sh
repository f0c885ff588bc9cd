#!/usr/bin/env bash
# Multi-host pod-slice launch for the canonical recipe (TPU-native analogue
# of the reference's bin/public_cluster.sh single-GPU SLURM submission).
#
# Run this SAME script on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
# On a real TPU pod slice jax.distributed autodetects the topology, so no
# env vars are needed; off-TPU (or for manual orchestration) export:
#   JAX_COORDINATOR_ADDRESS=<host0>:<port>   # required
#   JAX_NUM_PROCESSES=<n_hosts>              # required
#   JAX_PROCESS_ID=<0..n_hosts-1>            # required, unique per host
# initialize_multihost() (fancyrec_tpu/parallel/distributed.py) reads these
# and brings up jax.distributed before the mesh is built; only process 0
# writes checkpoints and metrics.
#
# MESH_SHAPE picks the data,model split over ALL global devices, e.g. a
# v5e-16 (2 hosts x 8 chips): MESH_SHAPE=16,1 for pure dp or 8,2 for dp+tp.
# Empty = every global device on the data axis.
set -e

rootpath=${ROOTPATH:-$HOME/insCar}
mesh_shape=${MESH_SHAPE:-}
postfix=${POSTFIX:-pod_ph_cl_mean_0001}

trainCollection=insCartrain
valCollection=insCarval
testCollection=insCartest
video_feature=resnet152_dim_2048
img_feature=imgfeat_dim_2048
metric=auc
margin=0.2
n_caption=1
overwrite=1
measure=cosine
num_epochs=30
brand_num=51
batch_size=8
accumulation_step=8
learning_rate=0.0001
brand_aspect=2000
text_mapping_size=1024
visual_mapping_size=1024
common_embedding_size=1024
fusion_style=ph
loss_fun=cl        # mrl|CrossCLR|cl
cost_style=mean    # mean|sum
concate=full       # full|reduced
text_net=transformers  # bi-gru|transformers

python -m fancyrec_tpu.train.trainer $trainCollection $valCollection $testCollection \
    --rootpath "$rootpath" \
    --mesh_shape "$mesh_shape" \
    --brand_num $brand_num \
    --overwrite $overwrite \
    --text_norm --visual_norm \
    --video_feature $video_feature --img_feature $img_feature \
    --n_caption $n_caption --concate $concate --loss_fun $loss_fun \
    --num_epochs $num_epochs --text_net $text_net --batch_size $batch_size \
    --accumulation_step $accumulation_step \
    --metric $metric --learning_rate $learning_rate \
    --common_embedding_size $common_embedding_size \
    --text_mapping_size $text_mapping_size \
    --visual_mapping_size $visual_mapping_size --margin $margin \
    --fusion_style $fusion_style \
    --max_violation --postfix "$postfix" \
    --measure $measure --cost_style $cost_style \
    --brand_aspect $brand_aspect

# Evaluate once, not on every worker. Run eval here only when this host is
# EXPLICITLY process 0, or when no pod env is present at all (single host).
# In autodetect pod mode JAX_PROCESS_ID is unset on every worker, so run
# bin/test_pod_instance.sh on one host afterwards instead.
if [ "${JAX_PROCESS_ID:-}" = "0" ]; then
    bash "$(dirname "$0")/test_instance.sh" "$postfix"
elif [ -z "${JAX_COORDINATOR_ADDRESS:-}" ] && \
     ! printf '%s' "${TPU_WORKER_HOSTNAMES:-}" | grep -q ,; then
    # single host: no coordinator and at most one worker entry (a tunneled
    # single chip exports TPU_WORKER_HOSTNAMES=localhost -- same parsing
    # as initialize_multihost)
    bash "$(dirname "$0")/test_instance.sh" "$postfix"
else
    echo "pod autodetect mode: skipping eval on this worker;" \
         "run bin/test_pod_instance.sh $postfix on one host"
fi
