#!/usr/bin/env python
"""Job-level data parallelism: a persistent queue of eval commands fanned out
across accelerator slots.

TPU-native counterpart of the reference's GPU job scheduler (reference:
parallelize_evals.py:15-245): one worker thread per device slot, each job
pinned to its slot via environment variables (``TPU_VISIBLE_CHIPS`` /
``CUDA_VISIBLE_DEVICES``), a journaled queue (queue.json / completed.json) so
interrupted sweeps resume, per-slot logs, and KeyboardInterrupt tear-down.

Jobs come from either a literal command file (one shell command per line) or
the cartesian product of cache configs x tasks x cache sizes.
"""

import argparse
import itertools
import json
import os
import subprocess
import threading
import time
from pathlib import Path
from queue import Empty, Queue


class JobQueue:
    def __init__(self, commands, n_slots, log_dir: Path, device_env: str):
        self.queue = Queue()
        for cmd in commands:
            self.queue.put(cmd)
        self.n_slots = n_slots
        self.log_dir = log_dir
        self.device_env = device_env
        self.completed = []
        self.failed = []
        self.procs = {}
        self.lock = threading.Lock()
        log_dir.mkdir(parents=True, exist_ok=True)
        self._journal()

    def _journal(self):
        (self.log_dir / "queue.json").write_text(
            json.dumps(list(self.queue.queue), indent=2)
        )
        (self.log_dir / "completed.json").write_text(
            json.dumps(
                {"completed": self.completed, "failed": self.failed}, indent=2
            )
        )

    def worker(self, slot: int):
        log_fn = self.log_dir / f"slot_{slot}.log"
        while True:
            try:
                cmd = self.queue.get_nowait()
            except Empty:
                return
            env = dict(os.environ)
            env[self.device_env] = str(slot)
            print(f"[slot {slot}] {cmd}")
            with open(log_fn, "a") as log:
                log.write(f"\n==== {time.ctime()} :: {cmd}\n")
                log.flush()
                proc = subprocess.Popen(
                    cmd, shell=True, stdout=log, stderr=log, env=env
                )
                with self.lock:
                    self.procs[slot] = proc
                code = proc.wait()
            with self.lock:
                self.procs.pop(slot, None)
                (self.completed if code == 0 else self.failed).append(
                    {"cmd": cmd, "exit_code": code, "slot": slot}
                )
                self._journal()
            self.queue.task_done()

    def run(self):
        threads = [
            threading.Thread(target=self.worker, args=(slot,), daemon=True)
            for slot in range(self.n_slots)
        ]
        for t in threads:
            t.start()
        try:
            while any(t.is_alive() for t in threads):
                time.sleep(1)
        except KeyboardInterrupt:
            print("Interrupted: terminating running jobs ...")
            with self.lock:
                for proc in self.procs.values():
                    proc.terminate()
            raise
        print(
            f"Done: {len(self.completed)} succeeded, {len(self.failed)} failed."
        )


def build_commands(args):
    if args.command_file:
        return [
            line.strip()
            for line in Path(args.command_file).read_text().splitlines()
            if line.strip() and not line.startswith("#")
        ]
    commands = []
    for config, task, size in itertools.product(
        args.cache_configs, args.tasks, args.cache_sizes
    ):
        cmd = (
            f"python eval.py --cache_config {config} --tasks {task} "
            f"--max_cache_length {size} --num_samples {args.num_samples}"
        )
        if args.checkpoint_path:
            cmd += f" --checkpoint_path {args.checkpoint_path}"
        if args.extra_args:
            cmd += f" {args.extra_args}"
        commands.append(cmd)
    return commands


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Fan eval jobs out across accelerator slots."
    )
    parser.add_argument(
        "--command_file",
        type=str,
        default=None,
        help="File with one shell command per line (overrides the grid).",
    )
    parser.add_argument("--cache_configs", nargs="+", default=["full"])
    parser.add_argument("--tasks", nargs="+", default=["truthfulqa"])
    parser.add_argument(
        "--cache_sizes", nargs="+", type=float, default=[1.0]
    )
    parser.add_argument("--num_samples", type=int, default=500)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--extra_args", type=str, default=None)
    parser.add_argument(
        "--num_slots", type=int, default=1, help="Concurrent device slots."
    )
    parser.add_argument(
        "--device_env",
        type=str,
        default="TPU_VISIBLE_CHIPS",
        help="Env var used to pin a job to its slot "
        "(CUDA_VISIBLE_DEVICES on GPU hosts).",
    )
    parser.add_argument(
        "--log_dir", type=Path, default=Path("results/parallel_logs")
    )
    args = parser.parse_args()

    commands = build_commands(args)
    print(f"{len(commands)} jobs across {args.num_slots} slots")
    JobQueue(commands, args.num_slots, args.log_dir, args.device_env).run()
