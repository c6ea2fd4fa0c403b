"""HTTP serving gateway: NavServer on the wire (serving_http.py).

Covers: full episodes driven over HTTP against the geometric world
(concurrent clients coalescing in the batcher), the npz step protocol,
env-layer compatibility of wire-decoded actions, and the HTTP error
mapping (400/404/409).
"""

import threading

import numpy as np
import pytest

import jax

from etpnav_tpu.config import tiny_config
from etpnav_tpu.env.geometric import GeometricNavEnv
from etpnav_tpu.serving import NavServer
from etpnav_tpu.serving_http import (HttpNavClient, HttpNavError,
                                     make_http_server, to_jsonable)
from etpnav_tpu.training.agent import JittedAgent, init_agent_params


@pytest.fixture(scope="module")
def http_stack():
    cfg = tiny_config()
    agent = JittedAgent(cfg, init_agent_params(jax.random.PRNGKey(0), cfg))
    nav = NavServer(cfg, agent, max_batch=4, max_wait_ms=100.0,
                    max_steps=4)
    httpd = make_http_server(nav, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield url, cfg
    httpd.shutdown()
    nav.shutdown()


def _make_env(cfg, seed):
    return GeometricNavEnv(
        num_envs=1, seed=seed, vocab_size=cfg.planner.vocab_size,
        max_instr_len=cfg.il.max_text_len, image_size=cfg.clip.image_size,
        depth_size=cfg.depth.input_size, pad_id=cfg.planner.pad_token_id)


def _run_episode(url, cfg, seed, out):
    client = HttpNavClient(url)
    env = _make_env(cfg, seed)
    obs = env.reset()[0]
    sid = client.create_session(obs["instruction"])
    steps = 0
    try:
        while True:
            pos, ori = env.get_pos_ori()
            res = client.step(sid, obs["rgb"], obs["depth"],
                              pos[0], ori[0])
            steps += 1
            action = res["action"]
            assert action["act"] in (0, 4)
            assert np.isfinite(res["stop_prob"])
            r = env.step([action])[0]      # wire-decoded action drives env
            obs = r.observation
            if res["done"] or r.done:
                break
        info = client.close_session(sid)
        out[seed] = {"steps": steps, "closed": info["steps"]}
    except Exception as e:              # surface thread failures to pytest
        out[seed] = e


def test_http_episodes_concurrent(http_stack):
    url, cfg = http_stack
    client = HttpNavClient(url)
    assert client.healthz() == {"ok": True}
    out = {}
    threads = [threading.Thread(target=_run_episode,
                                args=(url, cfg, s, out))
               for s in (1, 2, 3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(out) == 3
    for seed, r in out.items():
        assert not isinstance(r, Exception), r
        assert 1 <= r["steps"] <= 5
        assert r["closed"] == r["steps"]
    stats = client.stats()
    assert stats["steps_served"] >= sum(r["steps"] for r in out.values())
    assert stats["batches"] >= 1


def test_http_error_mapping(http_stack):
    url, cfg = http_stack
    client = HttpNavClient(url)

    with pytest.raises(HttpNavError) as e:      # malformed create
        client._req("POST", "/sessions", b"not json")
    assert e.value.code == 400

    with pytest.raises(HttpNavError) as e:      # unknown session
        client.close_session(999_999)
    assert e.value.code == 404

    env = _make_env(cfg, 7)
    obs = env.reset()[0]
    sid = client.create_session(obs["instruction"])

    with pytest.raises(HttpNavError) as e:      # wrong rgb shape
        client.step(sid, obs["rgb"][:, :4], obs["depth"],
                    np.zeros(3), np.array([0.0, 0, 0, 1]))
    assert e.value.code == 400

    with pytest.raises(HttpNavError) as e:      # not an npz body
        client._req("POST", f"/sessions/{sid}/step", b"garbage",
                    content_type="application/x-npz")
    assert e.value.code == 400

    with pytest.raises(HttpNavError) as e:      # no such route
        client._req("GET", "/nope")
    assert e.value.code == 404

    # drive to completion, then a step on the stopped session -> 409
    steps = 0
    while True:
        pos, ori = env.get_pos_ori()
        res = client.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
        steps += 1
        obs = env.step([res["action"]])[0].observation
        if res["done"]:
            break
        assert steps < 10
    with pytest.raises(HttpNavError) as e:
        pos, ori = env.get_pos_ori()
        client.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
    assert e.value.code == 409
    client.close_session(sid)


def test_http_internal_error_is_500_and_bad_length_is_400(http_stack):
    """Unknown RuntimeErrors are server faults (500), not session
    conflicts (409); a malformed Content-Length gets a clean 400 instead
    of a dropped connection."""
    import socket

    url, cfg = http_stack
    client = HttpNavClient(url)

    env = _make_env(cfg, 31)
    obs = env.reset()[0]
    sid = client.create_session(obs["instruction"])
    # make the very next step() blow up with a non-protocol RuntimeError
    import etpnav_tpu.serving_http as sh
    orig_step = sh.NavServer.step
    sh.NavServer.step = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("XLA device lost"))
    try:
        with pytest.raises(HttpNavError) as e:
            pos, ori = env.get_pos_ori()
            client.step(sid, obs["rgb"], obs["depth"], pos[0], ori[0])
        assert e.value.code == 500
        assert "XLA device lost" in e.value.detail
    finally:
        sh.NavServer.step = orig_step
    client.close_session(sid)

    host, port = url.replace("http://", "").split(":")
    with socket.create_connection((host, int(port)), timeout=30) as s:
        s.sendall(b"POST /sessions HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Length: abc\r\n\r\n")
        reply = s.recv(4096).decode()
    assert reply.startswith("HTTP/1.1 400"), reply
    assert "Content-Length" in reply


def test_cli_serve_end_to_end(tmp_path):
    """--run-type serve builds the SS-ETP policy without envs, binds the
    gateway, and serves a full episode over the wire."""
    from etpnav_tpu.run import run

    p = tmp_path / "exp.yaml"
    p.write_text("BASE: tiny\n")
    httpd, nav = run(["--exp-config", str(p), "--run-type", "serve",
                      "--host", "127.0.0.1", "--port", "0",
                      "--serve-max-batch", "2", "--serve-nonblocking"])
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        cfg = nav.cfg
        out = {}
        _run_episode(url, cfg, 11, out)
        assert not isinstance(out[11], Exception), out[11]
        assert out[11]["steps"] >= 1
    finally:
        httpd.shutdown()
        nav.shutdown()


def test_cli_serve_rejects_other_trainers(tmp_path):
    from etpnav_tpu.run import run
    p = tmp_path / "exp.yaml"
    p.write_text("BASE: tiny\n")
    with pytest.raises(ValueError, match="SS-ETP"):
        run(["--exp-config", str(p), "--run-type", "serve",
             "--trainer", "Pretrain"])


def test_to_jsonable_roundtrip():
    from etpnav_tpu.serving_http import action_from_wire
    action = {"act": 4, "front_pos": np.array([1.0, 0.0, 2.0]),
              "ghost_pos": np.array([3.0, 0.0, 4.0]),
              "back_path": [(2, np.array([0.5, 0.0, 0.25]))],
              "tryout": True}
    import json
    wire = json.loads(json.dumps(to_jsonable(action)))
    back = action_from_wire(wire)
    assert back["act"] == 4 and back["tryout"] is True
    np.testing.assert_array_equal(back["front_pos"], action["front_pos"])
    np.testing.assert_array_equal(back["ghost_pos"], action["ghost_pos"])
    assert back["back_path"][0][0] == 2
    np.testing.assert_array_equal(back["back_path"][0][1],
                                  action["back_path"][0][1])
    assert isinstance(back["back_path"][0], tuple)
