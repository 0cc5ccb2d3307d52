#!/bin/bash
# TPU-VM provisioning (reference: instance_startup_script.sh:1-25).
#
# The reference's GPU VM script installs the NVIDIA driver, nvidia-docker2,
# and the Cloud Ops agent.  TPU VMs ship with the accelerator runtime
# (libtpu + /dev/vfio) preinstalled, so provisioning reduces to observability
# and registry auth.  Use as --metadata startup-script for TPU VMs created
# outside Cloud Batch; Batch-managed instances are configured by
# cuking_tpu/cloud/batch_submit.py instead.

set -euo pipefail

# Cloud Ops agent for system metrics + log routing (mirrors
# instance_startup_script.sh:5-8).
curl -sSO https://dl.google.com/cloudagents/add-google-cloud-ops-agent-repo.sh
bash add-google-cloud-ops-agent-repo.sh --also-install

# Docker auth for Artifact Registry pulls (instance_startup_script.sh:23-25).
yes | gcloud auth configure-docker us-central1-docker.pkg.dev
