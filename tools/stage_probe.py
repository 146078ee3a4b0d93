"""Event-log probe: per-phase wall / CPU / shuffle / scheduling breakdown.

Parses Spark event logs (JSONL, one app per file) and attributes every
task's metrics to the job description set by rollup_job
(``bounds`` / ``tier0_5m`` / ``coarse`` / ``compress`` / ``warm:*``), so a
scaling regression can be localized to a PHASE and a COST CLASS instead of
guessed at. Cost classes per phase:

  wall          job submission → completion (driver-observed)
  run           Σ task executorRunTime        (executor compute, incl. GC)
  gc            Σ task jvmGcTime
  fetch_wait    Σ shuffle read fetchWaitTime  (blocked on remote blocks)
  shuf_write    Σ shuffle write time
  deser/result  Σ task deserialize / result serialization time
  sched_gap     Σ (task wall − runTime − deser − resultSer) — scheduling,
                launch latency, and commit coordination billed to tasks
  driver_gap    app time BETWEEN jobs of the phase group (driver/py4j work,
                RPC round-trips, job-submit latency)

Usage:
  python tools/stage_probe.py <event-log-file-or-dir> [...]
  python tools/stage_probe.py --compare N.json 4N.json   # ratio table

Writes one JSON object per app to stdout; human table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _iter_events(path: str):
    # Spark 4 rolling event logs are DIRECTORIES (eventlog_v2_<app>/ with
    # ordered events_N_... part files plus an appstatus_ marker)
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        parts = [path]
    for part in parts:
        if part.endswith(".zstd"):
            # Spark compresses rolling event logs with zstd; no python
            # binding in this env, so stream through the zstd CLI
            import io
            import shutil
            import subprocess

            zstd = shutil.which("zstd")
            if not zstd:
                raise RuntimeError(f"{part}: zstd CLI needed to decompress")
            proc = subprocess.Popen(
                [zstd, "-dc", part], stdout=subprocess.PIPE
            )
            f_ctx = io.TextIOWrapper(
                proc.stdout, encoding="utf-8", errors="replace"
            )
        else:
            f_ctx = open(part, encoding="utf-8", errors="replace")
        with f_ctx as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(ev, dict):
                    yield ev


def parse_app(path: str) -> dict:
    """One event-log file → per-phase metric dict."""
    app = {
        "file": os.path.basename(path),
        "app_name": None,
        "master": None,
        "executors": 0,
        "total_cores": 0,
    }
    # stage id → phase name (from the job that submitted it)
    stage_phase: dict[int, str] = {}
    job_phase: dict[int, str] = {}
    job_times: dict[int, list] = {}  # job id → [start_ms, end_ms]
    phases: dict[str, dict] = defaultdict(
        lambda: {
            "jobs": 0,
            "stages": 0,
            "tasks": 0,
            "wall_ms": 0,
            "run_ms": 0,
            "cpu_ms": 0,
            "gc_ms": 0,
            "fetch_wait_ms": 0,
            "shuf_write_ms": 0,
            "deser_ms": 0,
            "result_ser_ms": 0,
            "sched_gap_ms": 0,
            "input_bytes": 0,
            "shuffle_read_bytes": 0,
            "shuffle_remote_bytes": 0,
            "shuffle_write_bytes": 0,
            "peak_concurrent_tasks": 0,
        }
    )
    task_spans: dict[str, list] = defaultdict(list)  # phase → (launch, finish)
    stage_meta: dict[int, dict] = {}  # stage id → name/wall/tasks detail

    for ev in _iter_events(path):
        et = ev.get("Event")
        if et == "SparkListenerApplicationStart":
            app["app_name"] = ev.get("App Name")
        elif et == "SparkListenerEnvironmentUpdate":
            sp = ev.get("Spark Properties", {})
            app["master"] = sp.get("spark.master")
        elif et == "SparkListenerExecutorAdded":
            app["executors"] += 1
            app["total_cores"] += ev.get("Executor Info", {}).get(
                "Total Cores", 0
            )
        elif et == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            desc = props.get("spark.job.description") or props.get(
                "callSite.short", "?"
            )
            job_phase[jid] = desc
            job_times[jid] = [ev.get("Submission Time"), None]
            for si in ev.get("Stage Infos", []):
                stage_phase[si["Stage ID"]] = desc
            phases[desc]["jobs"] += 1
        elif et == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in job_times:
                job_times[jid][1] = ev.get("Completion Time")
        elif et == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            ph = stage_phase.get(sid, "?")
            p = phases[ph]
            p["stages"] += 1
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub and comp:
                p["wall_ms"] += comp - sub
            m = stage_meta.setdefault(
                sid, {"durs": [], "run_ms": 0, "cpu_ms": 0}
            )
            m["phase"] = ph
            m["name"] = (si.get("Stage Name") or "")[:60]
            m["wall_ms"] = (comp - sub) if sub and comp else 0
            m["n_tasks"] = si.get("Number of Tasks")
        elif et == "SparkListenerTaskEnd":
            ph = stage_phase.get(ev.get("Stage ID"), "?")
            p = phases[ph]
            ti = ev.get("Task Info", {})
            tm = ev.get("Task Metrics") or {}
            p["tasks"] += 1
            launch, finish = ti.get("Launch Time", 0), ti.get("Finish Time", 0)
            dur = max(0, finish - launch)
            run = tm.get("Executor Run Time", 0)
            deser = tm.get("Executor Deserialize Time", 0)
            rser = tm.get("Result Serialization Time", 0)
            p["run_ms"] += run
            # run is task WALL; cpu is actual on-CPU ns — a gap between
            # them means the task thread was descheduled or blocked (GC
            # pauses, CPU contention with the JVM's own service threads)
            p["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
            p["gc_ms"] += tm.get("JVM GC Time", 0)
            p["deser_ms"] += deser
            p["result_ser_ms"] += rser
            p["sched_gap_ms"] += max(0, dur - run - deser - rser)
            srm = tm.get("Shuffle Read Metrics") or {}
            p["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
            p["shuffle_read_bytes"] += srm.get("Remote Bytes Read", 0) + srm.get(
                "Local Bytes Read", 0
            )
            p["shuffle_remote_bytes"] += srm.get("Remote Bytes Read", 0)
            swm = tm.get("Shuffle Write Metrics") or {}
            p["shuf_write_ms"] += swm.get("Shuffle Write Time", 0) // 1_000_000
            p["shuffle_write_bytes"] += swm.get("Shuffle Bytes Written", 0)
            im = tm.get("Input Metrics") or {}
            p["input_bytes"] += im.get("Bytes Read", 0)
            if launch and finish:
                task_spans[ph].append((launch, finish))
            sm = stage_meta.setdefault(
                ev.get("Stage ID"), {"durs": [], "run_ms": 0, "cpu_ms": 0}
            )
            sm["durs"].append(dur)
            sm["run_ms"] += run
            sm["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000

    # driver gaps: per phase group, time from the phase's first job start to
    # last job end MINUS the union of its jobs' [start, end] spans, plus the
    # gap between this phase's jobs (driver-side time between actions)
    for ph in phases:
        jids = sorted(j for j, d in job_phase.items() if d == ph)
        spans = [
            (job_times[j][0], job_times[j][1])
            for j in jids
            if job_times[j][0] and job_times[j][1]
        ]
        spans.sort()
        gap = 0
        for (s0, e0), (s1, _e1) in zip(spans, spans[1:]):
            gap += max(0, s1 - e0)
        phases[ph]["driver_gap_ms"] = gap
        phases[ph]["job_span_ms"] = (
            spans[-1][1] - spans[0][0] if spans else 0
        )
        # peak task concurrency: how many tasks actually overlapped —
        # detects wave raggedness / under-subscription
        events = []
        for s, e in task_spans[ph]:
            events.append((s, 1))
            events.append((e, -1))
        events.sort()
        cur = peak = 0
        for _, d in events:
            cur += d
            peak = max(peak, cur)
        phases[ph]["peak_concurrent_tasks"] = peak

    app["phases"] = dict(phases)
    # per-stage task-shape detail: is a slow stage ragged (max ≫ median
    # task) or wave-quantized (n_tasks just over a multiple of the cores)?
    app["stages"] = [
        {
            "stage": sid,
            "phase": m.get("phase", "?"),
            "name": m.get("name", ""),
            "wall_ms": m.get("wall_ms", 0),
            "n_tasks": m.get("n_tasks", len(m["durs"])),
            "run_ms": m["run_ms"],
            "cpu_ms": m.get("cpu_ms", 0),
            "max_task_ms": max(m["durs"], default=0),
            "p50_task_ms": (
                sorted(m["durs"])[len(m["durs"]) // 2] if m["durs"] else 0
            ),
        }
        for sid, m in sorted(stage_meta.items())
    ]
    return app


def _fmt_ms(v: int) -> str:
    return f"{v / 1000:.2f}"


def report(app: dict, out=sys.stderr) -> None:
    print(
        f"\n== {app['file']}  app={app['app_name']}  master={app['master']}  "
        f"executors={app['executors']}×{app['total_cores'] // max(app['executors'], 1)}core",
        file=out,
    )
    hdr = (
        f"{'phase':<14}{'jobs':>5}{'tasks':>6}{'span_s':>8}{'run_s':>8}"
        f"{'gc_s':>7}{'fetchW_s':>9}{'shufW_s':>8}{'sched_s':>8}"
        f"{'drvGap_s':>9}{'peak':>5}{'in_MB':>8}{'shR_MB':>8}"
    )
    print(hdr, file=out)
    for ph, p in sorted(
        app["phases"].items(), key=lambda kv: -kv[1]["job_span_ms"]
    ):
        print(
            f"{ph:<14}{p['jobs']:>5}{p['tasks']:>6}"
            f"{_fmt_ms(p['job_span_ms']):>8}{_fmt_ms(p['run_ms']):>8}"
            f"{_fmt_ms(p['gc_ms']):>7}{_fmt_ms(p['fetch_wait_ms']):>9}"
            f"{_fmt_ms(p['shuf_write_ms']):>8}{_fmt_ms(p['sched_gap_ms']):>8}"
            f"{_fmt_ms(p['driver_gap_ms']):>9}{p['peak_concurrent_tasks']:>5}"
            f"{p['input_bytes'] / 1e6:>8.0f}{p['shuffle_read_bytes'] / 1e6:>8.0f}",
            file=out,
        )


def compare(path_n: str, path_4n: str) -> None:
    """Ratio table between two parsed-app JSON files (N vs 4N)."""
    with open(path_n) as f:
        a = json.load(f)
    with open(path_4n) as f:
        b = json.load(f)
    scale = b["total_cores"] / max(a["total_cores"], 1)
    print(
        f"N={a['total_cores']} cores vs 4N={b['total_cores']} cores "
        f"(ideal span ratio {1 / scale:.3f})"
    )
    print(f"{'phase':<14}{'N_span':>8}{'4N_span':>9}{'eff':>6}  dominant 4N excess")
    for ph in a["phases"]:
        if ph not in b["phases"]:
            continue
        pn, p4 = a["phases"][ph], b["phases"][ph]
        sn, s4 = pn["job_span_ms"], p4["job_span_ms"]
        if not sn or not s4:
            continue
        eff = (sn / s4) / scale
        # which cost class grew most at 4N relative to perfect scaling
        excess = {
            k: p4[k] - pn[k] / 1  # totals are Σ over tasks: equal-work ⇒ equal
            for k in (
                "run_ms",
                "gc_ms",
                "fetch_wait_ms",
                "sched_gap_ms",
                "driver_gap_ms",
                "deser_ms",
            )
        }
        top = max(excess, key=lambda k: excess[k])
        print(
            f"{ph:<14}{_fmt_ms(sn):>8}{_fmt_ms(s4):>9}{eff:>6.3f}  "
            f"{top} +{_fmt_ms(excess[top])}s "
            f"(run {_fmt_ms(pn['run_ms'])}→{_fmt_ms(p4['run_ms'])}, "
            f"sched {_fmt_ms(pn['sched_gap_ms'])}→{_fmt_ms(p4['sched_gap_ms'])}, "
            f"gc {_fmt_ms(pn['gc_ms'])}→{_fmt_ms(p4['gc_ms'])}, "
            f"fetchW {_fmt_ms(pn['fetch_wait_ms'])}→{_fmt_ms(p4['fetch_wait_ms'])}, "
            f"drvGap {_fmt_ms(pn['driver_gap_ms'])}→{_fmt_ms(p4['driver_gap_ms'])})"
        )


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    if args[0] == "--compare":
        compare(args[1], args[2])
        return
    paths = []
    for a in args:
        if os.path.isdir(a) and not os.path.basename(a).startswith(
            "eventlog_v2_"
        ):
            paths.extend(
                os.path.join(a, f)
                for f in sorted(os.listdir(a))
                if not f.startswith(".") and not f.endswith(".inprogress")
            )
        else:
            paths.append(a)
    for p in paths:
        app = parse_app(p)
        report(app)
        print(json.dumps(app))


if __name__ == "__main__":
    main()
