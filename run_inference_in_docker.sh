#!/bin/bash
# Run process_video.py inside the xmem2-tpu-inference container on a TPU VM.
# TPU-native analog of the reference run_inference_in_docker.sh (same CLI:
# -v/--video, -m/--masks, -o/--output); the container sees the TPU runtime
# through --privileged + host networking instead of --runtime=nvidia.
set -euo pipefail

vid_abs_host=''
masks_abs_host=''
output_abs_host=''

key=''
while [ $# -gt 0 ]; do
  if [ -z "${key}" ]; then
    case "$1" in
      -v|--video)  key="vid_abs_host" ;;
      -m|--masks)  key="masks_abs_host" ;;
      -o|--output) key="output_abs_host" ;;
      *)
        echo "Error: invalid argument ${1}" >&2
        echo "Usage: $0 -v <video|frames dir> -m <masks dir> -o <output dir>" >&2
        exit 1
        ;;
    esac
  else
    if [ "${key}" = 'output_abs_host' ]; then
      value=$(realpath -m "${1}")           # output may not exist yet
    else
      value=$(realpath -e "${1}") || exit 1 # inputs must exist
    fi
    printf -v "${key}" '%s' "${value}"
    key=''
  fi
  shift
done

for pair in "vid_abs_host:-v|--video" "masks_abs_host:-m|--masks" \
            "output_abs_host:-o|--output"; do
  var="${pair%%:*}"; flag="${pair#*:}"
  if [ -z "${!var}" ]; then
    echo "Missing argument: ${flag}" >&2
    missing=1
  fi
done
[ -n "${missing:-}" ] && exit 1

mkdir -p "${output_abs_host}"

set -x
docker run --privileged --net host -it --rm \
  -v "${vid_abs_host}":"${vid_abs_host}" \
  -v "${masks_abs_host}":"${masks_abs_host}" \
  -v "${output_abs_host}":"${output_abs_host}" \
  xmem2-tpu-inference \
  python3 /app/process_video.py --video "${vid_abs_host}" \
      --masks "${masks_abs_host}" --output "${output_abs_host}"
