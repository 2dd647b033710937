"""Round-scoped measurement queue runner (VERDICT r3 weak #2 / next #7).

Every TPU A/B queue in this repo runs through this module so that:

  * logs live in-repo under runlogs/<queue>/ (committed evidence; /tmp does
    not survive driver session resets — see the round-3 salvage),
  * a HARD wall-clock deadline aborts the queue well before the driver's
    round-end capture (a leftover queue process held the TPU during the
    round-3 MULTICHIP capture and turned it rc=124),
  * a kill file (runlogs/KILL) stops the queue between legs, and
    scripts/killall_queues.sh kills it by PIDFILE — never by pattern match,
  * deterministic failures are NOT retried: only the TPU-service
    backend-unavailable signature is classified retryable (the round-3
    finisher requeued a guaranteed-crashing leg forever).

Usage (library):
    from queue_runner import Queue
    q = Queue("round4", deadline_min=240)
    q.leg("tag", {"ENV": "1"}, ["python", "bench.py"])
    q.done()
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNLOGS = os.path.join(REPO, "runlogs")
KILL_FILE = os.path.join(RUNLOGS, "KILL")

RETRYABLE_SIGNATURES = (
    # TPU service outage / reclaim: the only failure class worth requeueing.
    "Unable to initialize backend",
)


class QueueAbort(SystemExit):
    pass


class Queue:
    def __init__(self, name, deadline_min, default_timeout=1700,
                 unavail_max=12, unavail_sleep=240):
        self.name = name
        self.t_deadline = time.monotonic() + deadline_min * 60
        self.default_timeout = default_timeout
        self.unavail = 0
        self.unavail_max = unavail_max
        self.unavail_sleep = unavail_sleep
        self.dir = os.path.join(RUNLOGS, name)
        os.makedirs(self.dir, exist_ok=True)
        self.log_path = os.path.join(self.dir, "queue.log")
        self.pid_path = os.path.join(self.dir, "queue.pid")
        with open(self.pid_path, "w") as f:
            f.write(str(os.getpid()))
        self._log(f"## QUEUE {name} START pid={os.getpid()} "
                  f"deadline={deadline_min}min")

    def _log(self, line):
        with open(self.log_path, "a") as f:
            f.write(f"{line}\n")
        print(line, flush=True)

    def _remaining(self):
        return self.t_deadline - time.monotonic()

    def _check_abort(self, need_s):
        if os.path.exists(KILL_FILE):
            self._log(f"## QUEUE {self.name} ABORT: kill file {KILL_FILE}")
            self._cleanup()
            raise QueueAbort(3)
        if self._remaining() < need_s:
            self._log(
                f"## QUEUE {self.name} ABORT: deadline "
                f"({self._remaining():.0f}s left < {need_s}s needed)"
            )
            self._cleanup()
            raise QueueAbort(4)

    def leg(self, tag, env_over, cmd, timeout=None, max_timeout_retries=1):
        """Run one leg, appending ab_to_md-format blocks to the queue log.

        Returns True on rc=0.  Retries ONLY on the backend-unavailable
        signature (bounded) and on timeout (once); any other nonzero exit is
        terminal for the leg — deterministic failures must surface, not
        churn (VERDICT r3 weak #2).
        """
        timeout = timeout or self.default_timeout
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
        env.update(env_over)
        timeout_retries = 0
        attempt = 0
        while True:
            attempt += 1
            self._check_abort(need_s=min(timeout, self._remaining_floor()))
            leg_timeout = min(timeout, max(60, int(self._remaining()) - 30))
            stamp = time.strftime("%H:%M:%S")
            with open(self.log_path, "a") as f:
                f.write(f"=== {tag} (attempt {attempt}, {stamp}) ===\n")
            try:
                out = subprocess.run(
                    cmd, cwd=REPO, env=env, capture_output=True, text=True,
                    timeout=leg_timeout,
                )
                rc, text = out.returncode, out.stdout + out.stderr
            except subprocess.TimeoutExpired as e:
                rc = 124

                def _s(x):
                    return x.decode(errors="replace") if isinstance(x, bytes) \
                        else (x or "")

                text = _s(e.stdout) + _s(e.stderr)
            with open(self.log_path, "a") as f:
                f.write(text)
                f.write(f"\n--- exit {rc} ({time.strftime('%H:%M:%S')}) ---\n")
            if rc == 0:
                return True
            if rc == 124:
                timeout_retries += 1
                if timeout_retries > max_timeout_retries:
                    self._log(f"## LEG {tag}: timeout x{timeout_retries}, "
                              f"giving up (non-retryable)")
                    return False
                continue
            if any(sig in text for sig in RETRYABLE_SIGNATURES):
                self.unavail += 1
                if self.unavail >= self.unavail_max:
                    self._log(f"## QUEUE {self.name} ABORT: "
                              f"{self.unavail} backend-unavailable")
                    self._cleanup()
                    raise QueueAbort(2)
                time.sleep(min(self.unavail_sleep, max(0, self._remaining())))
                continue
            self._log(f"## LEG {tag}: rc={rc} deterministic failure, "
                      f"not retrying")
            return False

    def _remaining_floor(self):
        # Require at least a minute of runway to bother starting a leg.
        return 60

    def done(self):
        self._log(f"## QUEUE {self.name} DONE")
        self._cleanup()

    def _cleanup(self):
        try:
            os.remove(self.pid_path)
        except OSError:
            pass


def main():
    print(__doc__)
    return 0


if __name__ == "__main__":
    sys.exit(main())
