#!/usr/bin/env bash
# Multi-host TPU pod launch — the replacement for the reference's
# single-node SLURM job (run.sh: 1 node / 32 tasks / 512 GB / 12 h).
#
# Runs one process per host on a TPU pod slice; jax.distributed
# autodetects the coordinator from TPU metadata, the mesh spans every
# chip in the slice, and the ring sweep's ppermute rides ICI.
#
# Usage (from a GCE TPU VM controller):
#   gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
#     --command="cd uniprot_kmer_based_clustering_tpu && bash scripts/launch_pod.sh data.fasta out/"
#
# On a SLURM-managed TPU cluster, submit this script with one task per
# host; jax.distributed.initialize() picks up coordinator/process_id from
# the SLURM environment automatically.

set -euo pipefail

FASTA="${1:?usage: launch_pod.sh <fasta> <outdir> [extra cli args...]}"
OUT="${2:?usage: launch_pod.sh <fasta> <outdir> [extra cli args...]}"
shift 2

exec python -m uniprot_kmer_based_clustering_tpu.cli run "$FASTA" \
    --out "$OUT" --distributed "$@"
