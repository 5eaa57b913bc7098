"""Experiment scheduler — the Python replacement for the reference's bash
job schedulers (`run_all_vector_pairs.sh`, `run_ablation.sh`,
`reproduce_en_zh.sh` — SURVEY §2.1 #16-18).

Keeps their operational semantics:

- **job queue** built from a declarative plan (the bash ``BILINGUAL_PAIRS``
  / ``MONO_JOBS`` matrices become a JSON plan file);
- **resume by artifact completeness**: a job is skipped when every
  expected band's run file and ``*-agg.json`` already exist
  (`run_all_vector_pairs.sh:329-360,441-445`);
- **fail-fast**: a failed job (beyond ``max_failures``) stops the sweep
  and terminates running children (`:539-569`);
- **slot-capped concurrency**: jobs run as subprocesses with a global
  concurrency cap (the per-GPU slot table degenerates to one TPU-chip
  slot here; multi-slice scheduling plugs in via ``slots``).

Jobs are CLI commands (the same ``python -m codemix_dense_retrieval_tpu``
surface), so per-job logs and restart behavior match the reference.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import shlex
import subprocess
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("scheduler")


@dataclass
class Job:
    name: str
    argv: List[str]  # CLI arguments after `python -m codemix_dense_retrieval_tpu`
    outdir: str
    expected: List[str] = field(default_factory=list)  # artifact glob patterns
    eval_after: List[List[str]] = field(default_factory=list)  # evaluate argv lists
    env: Dict[str, str] = field(default_factory=dict)

    def complete(self) -> bool:
        """Artifact-completeness postcondition (resume semantics)."""
        out = pathlib.Path(self.outdir)
        if not self.expected:
            return False
        for pattern in self.expected:
            if not list(out.glob(pattern)):
                return False
        return True


@dataclass
class SweepResult:
    ran: List[str]
    skipped: List[str]
    failed: List[str]


class Scheduler:
    def __init__(
        self,
        jobs: Sequence[Job],
        *,
        slots: int = 1,
        max_failures: int = 1,
        python: Optional[str] = None,
        log_dir: Optional[pathlib.Path] = None,
    ) -> None:
        self.jobs = list(jobs)
        self.slots = max(1, slots)
        self.max_failures = max_failures
        self.python = python or sys.executable
        self.log_dir = pathlib.Path(log_dir) if log_dir else None

    def _spawn(self, job: Job) -> subprocess.Popen:
        cmd = [self.python, "-m", "codemix_dense_retrieval_tpu", *job.argv]
        log.info("starting job %s: %s", job.name, shlex.join(cmd))
        stdout = subprocess.DEVNULL
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            stdout = open(self.log_dir / f"{job.name}.log", "w")
        import os

        env = dict(os.environ)
        env.update(job.env)
        return subprocess.Popen(cmd, stdout=stdout, stderr=subprocess.STDOUT, env=env)

    def run(self, dry_run: bool = False) -> SweepResult:
        queue: List[Job] = []
        skipped: List[str] = []
        for job in self.jobs:
            if job.complete():
                log.info("job %s already complete; skipping (resume)", job.name)
                skipped.append(job.name)
            else:
                queue.append(job)
        if dry_run:
            for job in queue:
                log.info("would run: %s", job.name)
            return SweepResult([j.name for j in queue], skipped, [])

        running: Dict[str, subprocess.Popen] = {}
        job_by_name = {j.name: j for j in queue}
        ran: List[str] = []
        failed: List[str] = []
        pending = list(queue)
        try:
            while pending or running:
                while pending and len(running) < self.slots:
                    job = pending.pop(0)
                    running[job.name] = self._spawn(job)
                # reap
                done = [n for n, p in running.items() if p.poll() is not None]
                if not done:
                    time.sleep(0.2)
                    continue
                for name in done:
                    proc = running.pop(name)
                    job = job_by_name[name]
                    if proc.returncode != 0:
                        log.error("job %s FAILED (rc=%d)", name, proc.returncode)
                        failed.append(name)
                        if len(failed) >= self.max_failures:
                            self._kill_all(running)
                            return SweepResult(ran, skipped, failed)
                        continue
                    # post-run evals (per band, reference `:694-715`)
                    ok = True
                    for eval_argv in job.eval_after:
                        rc = subprocess.call(
                            [self.python, "-m", "codemix_dense_retrieval_tpu", *eval_argv]
                        )
                        if rc != 0:
                            ok = False
                            break
                    if ok and (not job.expected or job.complete()):
                        ran.append(name)
                    else:
                        log.error("job %s finished but artifacts incomplete", name)
                        failed.append(name)
                        if len(failed) >= self.max_failures:
                            self._kill_all(running)
                            return SweepResult(ran, skipped, failed)
        except KeyboardInterrupt:
            self._kill_all(running)
            raise
        return SweepResult(ran, skipped, failed)

    @staticmethod
    def _kill_all(running: Dict[str, subprocess.Popen]) -> None:
        for proc in running.values():
            try:
                proc.terminate()
            except OSError:
                pass
        for proc in running.values():
            try:
                proc.wait(timeout=10)
            except Exception:
                proc.kill()


def load_plan(path) -> List[Job]:
    """Plan file: {"jobs": [{"name", "argv", "outdir", "expected",
    "eval_after", "env"}...]}"""
    data = json.loads(pathlib.Path(path).read_text())
    jobs = []
    for j in data["jobs"]:
        jobs.append(
            Job(
                name=j["name"],
                argv=j["argv"],
                outdir=j["outdir"],
                expected=j.get("expected", []),
                eval_after=j.get("eval_after", []),
                env=j.get("env", {}),
            )
        )
    return jobs


def run_sweep_cli(args) -> None:
    jobs = load_plan(args.plan)
    sched = Scheduler(jobs, max_failures=args.max_failures)
    result = sched.run(dry_run=args.dry_run)
    print(
        json.dumps(
            {"ran": result.ran, "skipped": result.skipped, "failed": result.failed},
            indent=2,
        )
    )
    if result.failed:
        raise SystemExit(1)
