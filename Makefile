# Build / deploy targets (reference: Makefile — docker image lifecycle plus
# a `cut-video` convenience runner).
OUTPUT_LOC ?= ./output

IMAGE_TAG = cut-detection-tpu
VERSION = latest

.PHONY: build push pull cut-video cut-video-cpu native test bench

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

build: Dockerfile
	docker build -t $(IMAGE_TAG):$(VERSION) -f Dockerfile .

build-cpu: Dockerfile
	docker build -t $(IMAGE_TAG):cpu --build-arg JAX_EXTRA=cpu -f Dockerfile .

push:
	docker push $(IMAGE_TAG):$(VERSION)

pull:
	docker pull $(IMAGE_TAG):$(VERSION)

# Run the containerized pipeline on $(TAPE) mounted under /home/sources
# (reference Makefile:20-24 contract; TPU VMs pass the device through).
cut-video:
	docker run -d -v $(OUTPUT_LOC):/home/sources --privileged $(IMAGE_TAG):$(VERSION) $(TAPE)

cut-video-cpu:
	docker run -d -v $(OUTPUT_LOC):/home/sources $(IMAGE_TAG):cpu $(TAPE) --cpu
