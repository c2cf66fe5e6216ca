#!/usr/bin/env python
"""Multi-host launcher — the framework's `mpirun`/`mpi.sub` analog.

The reference launches with `mpirun -np $cpus ./main <k> <matrix>` under a
PBS template (`Source Code/scripts/mpi.sub:97`). A TPU pod slice instead
runs ONE process per host, each seeing its local chips, coordinated by
`jax.distributed.initialize`. Run THIS SAME command on every host of the
slice (TPU VM metadata supplies coordinator/process identity automatically
on Cloud TPU; flags override for manual clusters):

    python scripts/launch_multihost.py \
        --coordinator 10.0.0.2:8476 --num-processes 4 --process-id $ID \
        -- run synthetic:cop20k --k 32 --strategy banded_row

Everything after `--` is forwarded to the `spmm` CLI; the mesh it builds
spans every chip of every host, and collectives ride ICI within the slice.
"""

import argparse
import sys


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None,
                        help="host:port of process 0 (auto-detected on "
                             "Cloud TPU VMs when omitted)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("cli_args", nargs=argparse.REMAINDER,
                        help="arguments forwarded to the spmm CLI "
                             "(prefix with --)")
    args = parser.parse_args()

    import jax

    kwargs = {}
    if args.coordinator:
        kwargs["coordinator_address"] = args.coordinator
    if args.num_processes is not None:
        kwargs["num_processes"] = args.num_processes
    if args.process_id is not None:
        kwargs["process_id"] = args.process_id
    jax.distributed.initialize(**kwargs)

    print(f"[launch] process {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")

    forwarded = args.cli_args
    if forwarded and forwarded[0] == "--":
        forwarded = forwarded[1:]
    from sparsematrixmultiplicationmpi_tpu.cli import main as cli_main

    return cli_main(forwarded)


if __name__ == "__main__":
    sys.exit(main())
