"""CPU smokes for the measurement tools (tools/*.py).

The tools are TPU measurement harnesses; these smokes run them at toy
sizes on CPU (Pallas interpret mode auto-enables off-TPU) so interface
drift against the library surfaces they probe is caught by the suite,
not discovered mid-TPU-session.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def test_packed_split_runs_and_attributes(capsys):
    from tools.packed_split import main

    main(["--config", "tiny_test", "--batch", "4", "--iters", "1",
          "--bf16", "--q", "256"])
    last = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["batch"] == 4
    assert rec["full_ms"] > 0
    assert set(rec) >= {"nms_ms", "window_ms", "walk_ms",
                        "prep_and_decode_ms"}


def test_train_split_runs_and_attributes(capsys):
    from tools.train_split import main

    main(["--config", "tiny_test", "--batch", "2", "--iters", "2"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["batch"] == 2
    assert set(rec["device_ms"]) >= {"augment_only", "encode_only",
                                     "fwd_only", "fwdbwd_only",
                                     "opt_ema_only", "full_body"}
    assert rec["device_images_per_sec"] is None or \
        rec["device_images_per_sec"] > 0


def test_bench_suite_3c_device_resident_smoke():
    from ppn_tpu.bench.suite import bench_train_device_resident

    rec = bench_train_device_resident(batch=2, k=2, cache_size=4,
                                      config_name="tiny_test")
    assert rec["config"] == "3c_train_device_resident"
    assert rec["value"] > 0
    assert rec["steps_per_call"] == 2
