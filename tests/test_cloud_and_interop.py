"""Cloud fan-out (C16) and Hail interop (C14/C15) tests — no GCP, no Hail:
the render and poll logic take injectable runners; the Hail modules must
import cleanly and fail with a clear error when Hail is absent."""

import json

import pytest

from cuking_tpu.cloud.batch_submit import (
    build_parser,
    render_batch_job,
    submit_job,
    wait_for_completion,
)
from cuking_tpu.parallel.submatrix import num_shards
from cuking_tpu.utils.status import FailedPreconditionError


def test_render_batch_job_task_count_and_command():
    job = render_batch_job(
        input_uri="gs://b/in.parquet",
        output_uri="gs://b/out.parquet",
        kin_threshold=0.05,
        split_factor=4,
        docker_image="repo/cuking_tpu:latest",
        requester_pays_project="proj",
    )
    group = job["taskGroups"][0]
    # k(k+1)/2 independent tasks (cloud_batch_submit.py:73).
    assert group["taskCount"] == num_shards(4) == 10
    assert group["taskCountPerNode"] == 1
    cmd = group["taskSpec"]["runnables"][0]["container"]["commands"][-1]
    assert "--shard_index=$BATCH_TASK_INDEX" in cmd
    assert "--split_factor=4" in cmd
    assert "--kin_threshold=0.05" in cmd
    assert "--input_uri=gs://b/in.parquet" in cmd
    assert "--requester_pays_project=proj" in cmd
    # Reference task shape: 12 vCPU / 85 GiB / 36,000 s.
    assert group["taskSpec"]["computeResource"]["cpuMilli"] == 12000
    assert group["taskSpec"]["maxRunDuration"] == "36000s"
    assert job["logsPolicy"]["destination"] == "CLOUD_LOGGING"
    policy = job["allocationPolicy"]["instances"][0]["policy"]
    assert policy["machineType"] == "ct5lp-hightpu-1t"


def test_render_batch_job_extra_cli_args_passthrough():
    """--cuking-arg flags reach every task's command verbatim (e.g.
    --use_mesh to sweep each shard over a multi-chip task VM — the
    --split_factor x --use_mesh composition applied to the fan-out)."""
    from cuking_tpu.cloud.batch_submit import main as submit_main

    job = render_batch_job(
        input_uri="gs://b/in", output_uri="gs://b/out", kin_threshold=0.1,
        split_factor=2, docker_image="img",
        extra_cli_args=("--use_mesh", "--skip_existing"),
    )
    cmd = job["taskGroups"][0]["taskSpec"]["runnables"][0]["container"][
        "commands"][-1]
    assert cmd.endswith("--shard_index=$BATCH_TASK_INDEX --use_mesh "
                        "--skip_existing")
    # And the CLI plumbs it through --render-only.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = submit_main([
            "--input-uri", "gs://b/in", "--output-uri", "gs://b/out",
            "--kin-threshold", "0.1", "--split-factor", "2",
            "--docker-image", "img", "--cuking-arg=--use_mesh",
            "--render-only",
        ])
    assert rc == 0
    rendered = json.loads(buf.getvalue())
    cmd2 = rendered["taskGroups"][0]["taskSpec"]["runnables"][0]["container"][
        "commands"][-1]
    assert cmd2.endswith("--use_mesh")


def test_render_batch_job_omits_empty_requester_pays():
    job = render_batch_job(
        input_uri="gs://b/in", output_uri="gs://b/out", kin_threshold=0.1,
        split_factor=1, docker_image="img",
    )
    cmd = job["taskGroups"][0]["taskSpec"]["runnables"][0]["container"][
        "commands"][-1]
    assert "requester_pays" not in cmd
    assert job["taskGroups"][0]["taskCount"] == 1


def test_submit_job_invokes_gcloud_with_config():
    calls = []
    name = submit_job(
        {"taskGroups": []}, location="us-central1", job_name="cuking-test",
        runner=lambda cmd: calls.append(cmd),
    )
    assert name == "cuking-test"
    (cmd,) = calls
    assert cmd[:4] == ["gcloud", "batch", "jobs", "submit"]
    assert "--location=us-central1" in cmd
    config_arg = [a for a in cmd if a.startswith("--config=")][0]
    with open(config_arg.split("=", 1)[1]) as f:
        assert json.load(f) == {"taskGroups": []}


def test_wait_for_completion_polls_until_success_and_writes_sentinel():
    states = iter(["RUNNING", "RUNNING", "SUCCEEDED"])
    sleeps, sentinels = [], []

    state = wait_for_completion(
        "cuking-x",
        location="us-central1",
        output_uri="gs://b/out.parquet",
        runner=lambda cmd: json.dumps({"status": {"state": next(states)}}),
        sleep=sleeps.append,
        write_sentinel=sentinels.append,
        log=lambda *_: None,
    )
    assert state == "SUCCEEDED"
    assert sentinels == ["gs://b/out.parquet/_SUCCESS"]
    assert len(sleeps) == 2  # slept after each non-terminal poll


def test_wait_for_completion_failed_means_no_sentinel():
    sentinels = []
    state = wait_for_completion(
        "cuking-x",
        location="us-central1",
        output_uri="gs://b/out",
        runner=lambda cmd: json.dumps({"status": {"state": "FAILED"}}),
        sleep=lambda s: pytest.fail("should not sleep after terminal state"),
        write_sentinel=sentinels.append,
        log=lambda *_: None,
    )
    assert state == "FAILED"
    assert sentinels == []


def test_wait_for_completion_other_terminal_states_end_polling():
    """CANCELLED must not poll forever (the reference script only knows
    SUCCEEDED/FAILED; library callers need all terminal states handled)."""
    sentinels = []
    state = wait_for_completion(
        "cuking-x",
        location="us-central1",
        output_uri="gs://b/out",
        runner=lambda cmd: json.dumps({"status": {"state": "CANCELLED"}}),
        sleep=lambda s: pytest.fail("should not sleep after terminal state"),
        write_sentinel=sentinels.append,
        log=lambda *_: None,
    )
    assert state == "CANCELLED"
    assert sentinels == []


def test_wait_for_completion_transitional_states_keep_polling():
    """CANCELLATION_IN_PROGRESS / DELETION_IN_PROGRESS are transitional, not
    terminal: polling continues until they resolve, so the caller always
    receives a final state (ADVICE r2)."""
    states = iter(
        ["RUNNING", "CANCELLATION_IN_PROGRESS", "DELETION_IN_PROGRESS",
         "CANCELLED"]
    )
    sentinels = []
    state = wait_for_completion(
        "cuking-x",
        location="us-central1",
        output_uri="gs://b/out",
        runner=lambda cmd: json.dumps({"status": {"state": next(states)}}),
        sleep=lambda s: None,
        write_sentinel=sentinels.append,
        log=lambda *_: None,
    )
    assert state == "CANCELLED"
    assert sentinels == []


def test_wait_for_completion_deleted_job_resolves():
    """After DELETION_IN_PROGRESS the job RESOURCE disappears and describe
    starts failing; that is deletion's final outcome — report it instead of
    crashing the submitter with a CalledProcessError."""
    import subprocess

    responses = iter([
        json.dumps({"status": {"state": "RUNNING"}}),
        json.dumps({"status": {"state": "DELETION_IN_PROGRESS"}}),
    ])

    def runner(cmd):
        try:
            return next(responses)
        except StopIteration:
            raise subprocess.CalledProcessError(1, cmd, b"NOT_FOUND")

    state = wait_for_completion(
        "cuking-x", location="us-central1", output_uri="gs://b/out",
        runner=runner, sleep=lambda s: None,
        write_sentinel=lambda uri: pytest.fail("no sentinel for deletion"),
        log=lambda *_: None,
    )
    assert state == "DELETED"


def test_wait_for_completion_describe_failure_propagates():
    """A describe failure with NO deletion context is a real error."""
    import subprocess

    def runner(cmd):
        raise subprocess.CalledProcessError(1, cmd, b"PERMISSION_DENIED")

    with pytest.raises(subprocess.CalledProcessError):
        wait_for_completion(
            "cuking-x", location="us-central1", output_uri="gs://b/out",
            runner=runner, sleep=lambda s: None,
            write_sentinel=lambda uri: None, log=lambda *_: None,
        )


def test_wait_for_completion_poll_deadline():
    """A job stuck in an active state stops being polled after max_polls."""
    polls = []
    with pytest.raises(TimeoutError, match="not terminal"):
        wait_for_completion(
            "cuking-x",
            location="us-central1",
            output_uri="gs://b/out",
            runner=lambda cmd: (
                polls.append(1), json.dumps({"status": {"state": "RUNNING"}})
            )[1],
            sleep=lambda s: None,
            write_sentinel=lambda uri: None,
            log=lambda *_: None,
            max_polls=7,
        )
    assert len(polls) == 7


def test_batch_submit_render_only_cli(capsys):
    from cuking_tpu.cloud import batch_submit

    rc = batch_submit.main([
        "--input-uri", "gs://b/in", "--output-uri", "gs://b/out",
        "--kin-threshold", "0.05", "--split-factor", "3",
        "--docker-image", "img", "--render-only",
    ])
    assert rc == 0
    job = json.loads(capsys.readouterr().out)
    assert job["taskGroups"][0]["taskCount"] == 6


def test_batch_submit_reference_style_flags(capsys):
    """The reference submitter's flag set (cloud_batch_submit.py:11-34)
    works drop-in: image from project-id+tag-name, service account set."""
    from cuking_tpu.cloud import batch_submit

    rc = batch_submit.main([
        "--location", "us-central1", "--project-id", "my-proj",
        "--tag-name", "v1.2", "--service-account", "cuking@my-proj.iam",
        "--input-uri", "gs://b/in", "--output-uri", "gs://b/out",
        "--requester-pays-project", "my-proj",
        "--kin-threshold", "0.05", "--split-factor", "4", "--render-only",
    ])
    assert rc == 0
    job = json.loads(capsys.readouterr().out)
    container = job["taskGroups"][0]["taskSpec"]["runnables"][0]["container"]
    assert container["imageUri"] == (
        "us-central1-docker.pkg.dev/my-proj/images/cuking_tpu:v1.2"
    )
    assert job["allocationPolicy"]["serviceAccount"]["email"] == (
        "cuking@my-proj.iam"
    )


def test_batch_parser_requires_core_flags():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--input-uri", "gs://b/in"])


def test_hail_interop_gated_without_hail():
    pytest.importorskip("pytest")  # always true; keep symmetry
    try:
        import hail  # noqa: F401

        pytest.skip("Hail installed; gating test not applicable")
    except ImportError:
        pass

    from cuking_tpu.interop.mt_to_inputs import mt_to_cuking_inputs
    from cuking_tpu.interop.outputs_to_ht import cuking_outputs_to_ht

    with pytest.raises(FailedPreconditionError, match="requires Hail"):
        mt_to_cuking_inputs(None, "gs://b/in.parquet")
    with pytest.raises(FailedPreconditionError, match="requires Hail"):
        cuking_outputs_to_ht("gs://b/out.parquet")
