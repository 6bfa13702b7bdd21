.PHONY: native test bench closed-loop clean

native:
	cd native && python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# hermetic accuracy loop: train tiny VLM on a synthetic corpus, serve the
# native checkpoint, OCR held-out pages through the pipeline, score CER
closed-loop:
	python scripts/closed_loop_demo.py

clean:
	rm -rf native/build native/*.so
