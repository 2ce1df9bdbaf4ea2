"""Unit tests for the TPU diagnosis tool's pure pieces (tools/diagnose_tpu.py)."""

import socket
import threading

import tools.diagnose_tpu as diag


def test_relay_alive_detects_listener_and_absence():
    # a real listener on an ephemeral port
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    def _accept():
        try:
            c, _ = srv.accept()
            c.close()
        except OSError:
            pass  # listener closed mid-accept at test end

    t = threading.Thread(target=_accept, daemon=True)
    t.start()
    assert diag.relay_alive(port=port, timeout=2.0)
    srv.close()
    # "dead relay" check: a bound-but-not-listening port refuses connects
    # deterministically.  (Re-probing the just-freed port is flaky: the
    # kernel can pick it as the SOURCE port for the probe itself, and a
    # localhost simultaneous-open self-connects — seen once in the full
    # suite with background TPU clients making connections.)
    blocker = socket.socket()
    blocker.bind(("127.0.0.1", 0))
    try:
        assert not diag.relay_alive(port=blocker.getsockname()[1],
                                    timeout=1.0)
    finally:
        blocker.close()


def test_cache_age(tmp_path):
    assert diag.newest_cache_age_s(str(tmp_path / "missing")) is None
    assert diag.newest_cache_age_s(str(tmp_path)) is None  # empty dir
    (tmp_path / "entry").write_text("x")
    age = diag.newest_cache_age_s(str(tmp_path))
    assert age is not None and 0 <= age < 30
