#!/bin/bash
# Launch a pydreamer-tpu training job on GKE with a TPU node pool.
# TPU-native counterpart of the reference's single-GPU kubectl template
# (reference: scripts/kubernetes/run_pydreamer.sh): one pod gets a TPU slice
# (learner) and runs the generators on its host CPUs; replay lives on a
# shared GCS-fuse volume so restarts resume the same run.
#
# Usage: run_pydreamer_tpu.sh <experiment_name> <configs...>
#   EXTRA_ARGS="--batch_size 64" run_pydreamer_tpu.sh pong defaults atari

set -eu

NAME="${1:?experiment name}"
shift
CONFIGS="$*"
IMAGE="${IMAGE:-gcr.io/$(gcloud config get-value project)/pydreamer-tpu:latest}"
TPU_TYPE="${TPU_TYPE:-tpu-v5-lite-podslice}"
TPU_TOPOLOGY="${TPU_TOPOLOGY:-1x1}"
TPU_CHIPS="${TPU_CHIPS:-1}"
GCS_BUCKET="${GCS_BUCKET:?set GCS_BUCKET for run artifacts}"

cat <<EOF | kubectl apply -f -
apiVersion: batch/v1
kind: Job
metadata:
  name: pydreamer-tpu-${NAME}
spec:
  backoffLimit: 3            # restart on failure; PYDREAMER_RESUME_ID resumes the run
  template:
    metadata:
      annotations:
        gke-gcsfuse/volumes: "true"
    spec:
      restartPolicy: Never
      nodeSelector:
        cloud.google.com/gke-tpu-accelerator: ${TPU_TYPE}
        cloud.google.com/gke-tpu-topology: ${TPU_TOPOLOGY}
      containers:
      - name: trainer
        image: ${IMAGE}
        command: ["python", "-m", "pydreamer_tpu.launch"]
        args: [--configs, ${CONFIGS// /, }, --run_dir, /runs/${NAME}]
        env:
        - name: PYDREAMER_RESUME_ID
          value: "${NAME}"
        resources:
          requests:
            google.com/tpu: "${TPU_CHIPS}"
          limits:
            google.com/tpu: "${TPU_CHIPS}"
        volumeMounts:
        - name: runs
          mountPath: /runs
        - name: shm
          mountPath: /dev/shm
      volumes:
      - name: runs
        csi:
          driver: gcsfuse.csi.storage.gke.io
          volumeAttributes:
            bucketName: ${GCS_BUCKET}
      - name: shm
        emptyDir:
          medium: Memory
      tolerations:
      - key: google.com/tpu
        operator: Exists
        effect: NoSchedule
      - key: cloud.google.com/gke-spot
        operator: Equal
        value: "true"
        effect: NoSchedule
EOF

echo "Launched job pydreamer-tpu-${NAME} (${TPU_TYPE} ${TPU_TOPOLOGY})"
