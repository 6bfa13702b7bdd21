

class _MemStore:
    def __init__(self):
        self.objects = {}

    def get(self, key):
        return self.objects.get(key)

    def put(self, key, data):
        self.objects[key] = data

    def exists(self, key):
        return key in self.objects


class TestRemoteBackend:
    def _backend(self, tmp_path, store=None):
        from karanta_tpu.pipeline.work_queue import RemoteBackend

        store = store or _MemStore()
        return RemoteBackend("s3://bucket/ws", store=store,
                             local_mirror=str(tmp_path / "mirror")), store

    def test_index_roundtrip_and_prefix(self, tmp_path):
        backend, store = self._backend(tmp_path)
        groups = [("a.pdf", "b.pdf"), ("c.pdf",)]
        backend.write_index(groups)
        assert "ws/work_index_list.csv.zstd" in store.objects
        assert backend.read_index() == groups

    def test_empty_index(self, tmp_path):
        backend, _ = self._backend(tmp_path)
        assert backend.read_index() == []

    def test_finalize_marks_done_and_mirrors(self, tmp_path):
        import os

        backend, store = self._backend(tmp_path)
        os.makedirs(backend.results_dir, exist_ok=True)
        assert not backend.is_done("h1")
        tmp = backend.output_path("h1") + ".tmp"
        with open(tmp, "w") as f:
            f.write('{"text": "page"}\n')
        backend.finalize_output("h1", tmp)
        assert backend.is_done("h1")
        assert store.objects["ws/results/output_h1.jsonl"].startswith(b'{"text"')
        with open(backend.output_path("h1")) as f:  # local mirror kept
            assert "page" in f.read()

    def test_queue_resume_skips_done_groups(self, tmp_path):
        import os

        from karanta_tpu.pipeline.work_queue import WorkQueue, _group_hash

        backend, _ = self._backend(tmp_path)
        q = WorkQueue(backend)
        q.populate_queue(["a.pdf", "b.pdf", "c.pdf"], items_per_group=1)
        assert q.initialize_queue() == 3
        # complete one group remotely, as a crashed-then-restarted worker
        done = _group_hash(("b.pdf",))
        os.makedirs(backend.results_dir, exist_ok=True)
        tmp = backend.output_path(done) + ".tmp"
        with open(tmp, "w") as f:
            f.write("{}\n")
        backend.finalize_output(done, tmp)

        q2 = WorkQueue(self._backend(tmp_path)[0].__class__(
            "s3://bucket/ws", store=backend.store,
            local_mirror=str(tmp_path / "mirror2")))
        q2.populate_queue(["a.pdf", "b.pdf", "c.pdf"], items_per_group=1)
        assert q2.initialize_queue() == 2
        remaining = set()
        while q2.size:
            item = q2._queue.get_nowait()
            remaining.add(item.work_paths)
        assert remaining == {("a.pdf",), ("c.pdf",)}

    def test_make_backend_dispatch(self, tmp_path):
        from karanta_tpu.pipeline.work_queue import (
            LocalBackend, make_backend,
        )

        assert isinstance(make_backend(str(tmp_path / "ws")), LocalBackend)
        try:
            make_backend("weka://bucket/ws")
            raised = False
        except (ValueError, ImportError):
            raised = True
        assert raised
