# Same operator interface as the reference (reference Makefile:1-43),
# TPU-native underneath: no torchrun — SPMD over the chip mesh is enabled
# with train.dp.enabled=true in config.yaml.

PY ?= python
CFG ?= config.yaml

.PHONY: full train export bench infer check_errors test_batching quant \
        preprocess split demo test lapjv

full: train export bench

train:
	$(PY) -m dfine_tpu.apps.train $(CFG) $(OVERRIDES)

export:
	$(PY) -m dfine_tpu.apps.export $(CFG) $(OVERRIDES)

bench:
	$(PY) -m dfine_tpu.apps.bench $(CFG) $(OVERRIDES)

infer:
	$(PY) -m dfine_tpu.apps.infer $(CFG) $(OVERRIDES)

check_errors:
	$(PY) -m dfine_tpu.apps.check_errors $(CFG) $(OVERRIDES)

test_batching:
	$(PY) -m dfine_tpu.apps.test_batching $(CFG) $(OVERRIDES)

quant:
	$(PY) -m dfine_tpu.apps.quant $(CFG) $(OVERRIDES)

preprocess:
	$(PY) -m dfine_tpu.etl.preprocess $(CFG) $(OVERRIDES)

split:
	$(PY) -m dfine_tpu.etl.split $(CFG) $(OVERRIDES)

demo:
	$(PY) demo/demo.py $(CFG) $(OVERRIDES)

test:
	$(PY) -m pytest tests/ -x -q

lapjv:
	g++ -O3 -shared -fPIC -std=c++17 -o dfine_tpu/native/liblapjv.so \
	    dfine_tpu/native/lapjv.cpp -lpthread

profile:
	$(PY) tools/profile_train.py --what full $(OVERRIDES)

SEED ?= 42
convergence:  # dual-framework convergence parity (multi-seed: run per SEED)
	$(PY) tools/convergence_parity.py gen   --root $(CONV_ROOT)
	$(PY) tools/convergence_parity.py ours  --root $(CONV_ROOT) --epochs $(EPOCHS) --seed $(SEED)
	$(PY) tools/convergence_parity.py torch --root $(CONV_ROOT) --epochs $(EPOCHS) --seed $(SEED)
	$(PY) tools/convergence_parity.py report --root $(CONV_ROOT)

loader_probe:
	$(PY) tools/profile_train.py --what loader --size n --img 320
