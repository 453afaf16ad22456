#!/bin/bash
# Run the interactive GUI inside the xmem2-tpu-gui container on a TPU VM.
# TPU-native analog of the reference run_gui_in_docker.sh: same CLI
# (--images|--video|--workspace plus optional --num_objects), X11 forwarded
# into the container, TPU runtime exposed with --privileged + host net.
set -euo pipefail

key=''
key_name=''
value=''
num_objects=''

while [ $# -gt 0 ]; do
  if [ -z "${key}" ]; then
    case "$1" in
      --images|--video|--workspace)
        key="other"
        key_name="${1}"
        ;;
      --num_objects)
        key="--num_objects"
        ;;
      *)
        echo "Error: invalid argument ${1}" >&2
        echo "Specify one of --images --video or --workspace with a path," \
             "optionally --num_objects N." >&2
        exit 1
        ;;
    esac
  else
    if [ "${key}" = '--num_objects' ]; then
      num_objects="${1}"
    else
      value=$(realpath -e "${1}")  # input path must exist
    fi
    key=''
  fi
  shift
done

if [ -z "${key_name}" ]; then
  echo "Missing argument: --images|--video|--workspace <path>" >&2
  exit 1
fi

args=("${key_name}" "${value}")
if [ -n "${num_objects}" ]; then
  args+=("--num_objects" "${num_objects}")
fi

LOCAL_WORKSPACE_DIR="$(pwd)/workspace"
DISPLAY_TO_USE="${DISPLAY:-:0}"
mkdir -p "${LOCAL_WORKSPACE_DIR}"

set -x
docker run --privileged --net host -it --rm \
  -e DISPLAY="${DISPLAY_TO_USE}" \
  -v /tmp/.X11-unix:/tmp/.X11-unix \
  -v "${value}":"${value}" \
  -v "${LOCAL_WORKSPACE_DIR}":/app/workspace \
  xmem2-tpu-gui \
  python3 /app/interactive_demo.py "${args[@]}"
