"""Control-plane filesystem backends + the rename-free lease lock.

The engine/sink/index protocols must run on an object store, where the
POSIX toolbox (atomic rename, O_EXCL handles, pid probing) does not
exist. These tests pin the primitive semantics on BOTH backends and the
lease protocol's reclaim rules; the suites in test_engine/test_streaming
/test_dedup run the full protocols against ``ObjectStoreFS`` via their
backend-parametrized fixtures."""

import json
import os
import socket
import threading

import pytest

from metrique_spark.fs import (
    LeaseHeldError,
    LeaseLock,
    LocalFS,
    ObjectStoreFS,
    _pid_start_time,
)

BACKENDS = [LocalFS, ObjectStoreFS]


@pytest.fixture(params=BACKENDS, ids=lambda c: c.__name__)
def fs(request):
    return request.param()


def test_interface_has_no_rename(fs):
    # the portability guarantee is structural: no rename primitive exists,
    # so no protocol written over FileSystem can depend on one
    assert not hasattr(fs, "rename")
    assert not hasattr(fs, "replace")


def test_put_get_list_delete(fs, tmp_path):
    root = str(tmp_path / "store")
    p = fs.join(root, "a", "b.json")
    assert not fs.exists(p)
    with pytest.raises(FileNotFoundError):
        fs.read_text(p)
    fs.write_text(p, "one")          # parents created implicitly
    assert fs.read_text(p) == "one"
    assert fs.isfile(p) and not fs.isdir(p)
    assert fs.isdir(fs.join(root, "a"))
    fs.write_text(p, "two")          # overwrite
    assert fs.read_text(p) == "two"
    assert fs.mtime(p) is not None
    assert "a" in fs.listdir(root)
    assert fs.listdir(str(tmp_path / "missing")) == []
    fs.delete(p)
    assert not fs.exists(p)
    fs.delete(p)                      # absent delete is a no-op
    fs.write_text(fs.join(root, "a", "c.txt"), "x")
    fs.delete_dir(fs.join(root, "a"))
    assert not fs.isdir(fs.join(root, "a"))
    fs.delete_dir(fs.join(root, "a"))  # absent prefix delete is a no-op


def test_conditional_put_and_cas(fs, tmp_path):
    p = fs.join(str(tmp_path), "k")
    assert fs.put_if_absent(p, "first")
    assert not fs.put_if_absent(p, "second")
    assert fs.read_text(p) == "first"
    # CAS replace: wrong expectation fails and leaves content untouched
    assert not fs.replace_if_match(p, "x", expected="stale")
    assert fs.read_text(p) == "first"
    assert fs.replace_if_match(p, "x", expected="first")
    assert fs.read_text(p) == "x"
    # CAS on a missing object fails rather than creating it
    assert not fs.replace_if_match(fs.join(str(tmp_path), "nope"), "v", "v")
    # conditional delete
    assert not fs.delete_if_match(p, expected="first")
    assert fs.exists(p)
    assert fs.delete_if_match(p, expected="x")
    assert not fs.exists(p)
    assert not fs.delete_if_match(p, expected="x")


def test_put_if_absent_races_one_winner(fs, tmp_path):
    p = fs.join(str(tmp_path), "contested")
    wins = []

    def attempt(i):
        if fs.put_if_absent(p, f"w{i}"):
            wins.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert fs.read_text(p) == f"w{wins[0]}"


def test_lease_basic_acquire_release(fs, tmp_path):
    path = fs.join(str(tmp_path), ".cube.lock")
    lock = LeaseLock(fs, path)
    with lock.held():
        rec = json.loads(fs.read_text(path))
        assert rec["pid"] == os.getpid()
        with pytest.raises(LeaseHeldError):
            LeaseLock(fs, path).acquire()
    assert not fs.exists(path)
    # reacquirable after release
    with LeaseLock(fs, path).held():
        pass


def test_lease_dead_pid_reclaim_local_only(tmp_path):
    # pid probing is a LocalFS capability: a dead-pid lease is reclaimed
    # there, but ObjectStoreFS (holder could be any node) must NOT treat
    # an unprobeable pid as dead without a ttl
    rec = json.dumps({"owner": "o", "pid": 999999999, "pid_start": 1,
                      "host": socket.gethostname(), "acquired_at": 1.0})
    p_local = str(tmp_path / "l.lock")
    local = LocalFS()
    local.write_text(p_local, rec)
    lease = LeaseLock(local, p_local)
    lease.acquire()
    lease.release()

    p_obj = str(tmp_path / "o.lock")
    store = ObjectStoreFS()
    store.write_text(p_obj, rec)
    with pytest.raises(LeaseHeldError):
        LeaseLock(store, p_obj).acquire()


def test_lease_recycled_pid_is_dead(tmp_path):
    # live pid but a start time that can't be this process's: the pid was
    # recycled, the original holder is gone -> reclaimable (LocalFS)
    assert _pid_start_time(os.getpid()) is not None
    rec = json.dumps({"owner": "o", "pid": os.getpid(), "pid_start": -1,
                      "host": socket.gethostname(), "acquired_at": 1.0})
    fs = LocalFS()
    p = str(tmp_path / "r.lock")
    fs.write_text(p, rec)
    lease = LeaseLock(fs, p)
    lease.acquire()
    lease.release()


def test_lease_ttl_expiry_on_object_store(tmp_path):
    # the object-store recovery path: no pid probing, so a crashed remote
    # holder is reclaimed only once its lease exceeds the ttl
    fs = ObjectStoreFS()
    p = str(tmp_path / "t.lock")
    stale = json.dumps({"owner": "o", "pid": 1, "pid_start": 1,
                        "host": "elsewhere", "acquired_at": 1.0})
    fs.write_text(p, stale)
    with pytest.raises(LeaseHeldError):
        LeaseLock(fs, p, ttl=None).acquire()
    lease = LeaseLock(fs, p, ttl=60.0)   # acquired_at=1970 -> long expired
    lease.acquire()
    lease.release()
    assert not fs.exists(p)


def test_lease_release_never_removes_foreign_lease(tmp_path):
    # holder A's lease expires; B reclaims; A's late release must NOT
    # delete B's lease (conditional delete keyed on A's own record)
    fs = ObjectStoreFS()
    p = str(tmp_path / "f.lock")
    a = LeaseLock(fs, p)
    a.acquire()
    b = LeaseLock(fs, p, ttl=0.0)
    b.acquire()               # A's lease is expired under B's ttl -> CAS
    a.release()               # late release: must be a no-op
    assert fs.exists(p)
    assert json.loads(fs.read_text(p))["owner"] == \
        json.loads(b._token)["owner"]
    b.release()
    assert not fs.exists(p)


def test_lease_reclaim_race_single_winner(tmp_path):
    # N threads all judge the same dead lease stale; the CAS admits ONE
    fs = LocalFS()
    p = str(tmp_path / "race.lock")
    dead = json.dumps({"owner": "o", "pid": 999999999, "pid_start": 1,
                       "host": socket.gethostname(), "acquired_at": 1.0})
    fs.write_text(p, dead)
    results = []

    def attempt():
        lease = LeaseLock(fs, p)
        try:
            lease.acquire()
            results.append(lease)
        except LeaseHeldError:
            pass

    threads = [threading.Thread(target=attempt) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 1
    results[0].release()
    assert not fs.exists(p)


def test_unparseable_lease_blocks_without_ttl_expires_with(tmp_path):
    # a truncated/legacy record can't be judged by pid -> held without a
    # ttl (with a pointer to manual recovery), reclaimed by mtime + ttl
    fs = LocalFS()
    p = str(tmp_path / "c.lock")
    fs.write_text(p, "{not json")
    with pytest.raises(LeaseHeldError, match="delete the lease"):
        LeaseLock(fs, p).acquire()
    lease = LeaseLock(fs, p, ttl=0.0)
    lease.acquire()
    lease.release()


def test_lease_scalar_json_record_treated_as_unparseable(tmp_path):
    # legacy bare-pid lock files parse as JSON ints — they are NOT lease
    # records and must hit the unparseable branch (block with recovery
    # hint without a ttl, mtime+ttl reclaim with), never AttributeError
    fs = LocalFS()
    p = str(tmp_path / "legacy.lock")
    fs.write_text(p, "12345")
    with pytest.raises(LeaseHeldError, match="delete the lease"):
        LeaseLock(fs, p).acquire()
    lease = LeaseLock(fs, p, ttl=0.0)
    lease.acquire()
    lease.release()
