# Convenience targets; every command also works directly (see README Usage).

.PHONY: demo test bench

# self-contained quickstart: simulate tiny multi-scale event h5s and point
# datalist/{train,valid}_nfs.txt at them so configs/train_nfs.yml runs verbatim
demo:
	python -m bmcnet_esr_tpu.cli.generate demo

test:
	python -m pytest tests/ -q

bench:
	python bench.py
