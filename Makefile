# Convenience targets. See README.md for details.

.PHONY: test test-fast parity parity-log bench dryrun demo native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

parity:
	SCV_TF_PARITY=1 python -m pytest tests/test_tf_parity.py tests/test_keras_import.py tests/test_tfrecord.py -q

# run the TF-parity suite and append the round's evidence to TF_PARITY_LOG.md
parity-log:
	@SCV_TF_PARITY=1 python -m pytest tests/test_tf_parity.py tests/test_keras_import.py -q | tail -1
	@echo "record the output in TF_PARITY_LOG.md (see that file's header)"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py

demo:
	python examples/solar_end_to_end.py --steps 30

native:
	g++ -O3 -shared -fPIC -std=c++17 \
	  satellite_computervision_tpu/native/fastrecord.cc \
	  -o satellite_computervision_tpu/native/libfastrecord.so

clean:
	rm -rf .jax_cache satellite_computervision_tpu/native/libfastrecord.so
	find . -name __pycache__ -type d -exec rm -rf {} +
