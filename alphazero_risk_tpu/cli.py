"""Command-line entry point.

Mirrors the reference CLI (``alphazero_risk.cpp:160-199`` +
``settings.h:89-211``): mode dispatch over play / train / train-script /
train-data / analysis / bench, with flags mapped onto ``Config`` fields.

Usage examples:
  python -m alphazero_risk_tpu.cli -m play --p2 sp --games 1000 --mcts 32
  python -m alphazero_risk_tpu.cli -m train --tg 1000 --mcts 32
  python -m alphazero_risk_tpu.cli -m train-data --dgss 5000 --dgsr 5000
  python -m alphazero_risk_tpu.cli -m analysis
"""

from __future__ import annotations

import argparse
import json

from .config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="alphazero_risk_tpu",
        description="TPU-native AlphaZero for the game Risk")
    p.add_argument("-m", "--mode", default="play",
                   choices=["play", "train", "train-script", "train-data",
                            "analysis", "bench", "watch"])
    p.add_argument("--micro", action="store_true",
                   help="watch mode: pause every micro-decision, not turn")
    p.add_argument("--no-pause", action="store_true",
                   help="watch mode: dump all turns without waiting")
    p.add_argument("--p1", default="az", choices=["az", "sp", "rp"],
                   help="player 1 in play mode (reference --p1)")
    p.add_argument("--p2", default="sp", choices=["sp", "rp", "az"],
                   help="opponent in play mode (reference --p2)")
    p.add_argument("--c1", default="latest",
                   help="checkpoint role for player 1 (az)")
    p.add_argument("--c2", default="best",
                   help="checkpoint role for player 2 (az vs az)")
    p.add_argument("--games", "--cg", type=int, default=1000,
                   help="games for play/compare")
    p.add_argument("--mcts", type=int, default=None,
                   help="MCTS simulations per move")
    p.add_argument("--t", "--temp", dest="temp", type=int, default=None,
                   help="temperature threshold round")
    p.add_argument("--ti", type=int, default=None, help="train iterations")
    p.add_argument("--tg", type=int, default=None,
                   help="games per train iteration")
    p.add_argument("--e", dest="epochs", type=int, default=None)
    p.add_argument("--bs", dest="batch_size", type=int, default=None)
    p.add_argument("--ct", dest="compare_threshold", type=float,
                   default=None)
    p.add_argument("--hp", dest="cpuct", type=float, default=None)
    p.add_argument("--dnv", dest="noise_value", type=float, default=None)
    p.add_argument("--dne", dest="noise_eps", type=float, default=None)
    p.add_argument("--dgss", type=int, default=None)
    p.add_argument("--dgsr", type=int, default=None)
    p.add_argument("--dtl", type=int, default=None)
    p.add_argument("--blocks", type=int, default=None)
    p.add_argument("--env-batch", type=int, default=None,
                   help="lockstep games per device")
    p.add_argument("--max-steps", type=int, default=None,
                   help="micro-step cap per game")
    p.add_argument("--allow-yield", type=int, default=None)
    p.add_argument("--limit-reinforcement", type=int, default=None)
    p.add_argument("--limit-attack", type=int, default=None)
    p.add_argument("--mirror-games", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fast", action="store_true",
                   help="BN-folded fast inference for actors/arenas")
    p.add_argument("--int8", action="store_true",
                   help="with --fast: int8-quantized trunk")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend (debug)")
    # multi-host launch (one process per host; see parallel/distributed.py)
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port")
    p.add_argument("--nprocs", type=int, default=None,
                   help="multi-host: total number of processes")
    p.add_argument("--procid", type=int, default=None,
                   help="multi-host: this process's id")
    p.add_argument("--cpu-collectives", default=None,
                   choices=["gloo", "mpi"],
                   help="multi-host on CPU processes: collectives impl")
    return p


def config_from_args(args) -> Config:
    cfg = Config()
    over = {}
    mapping = {
        "mcts": "mcts_simulations", "temp": "temperature_threshold",
        "ti": "train_iterations", "tg": "train_iteration_games",
        "epochs": "epochs", "batch_size": "batch_size",
        "compare_threshold": "compare_threshold", "cpuct": "cpuct",
        "noise_value": "noise_value", "noise_eps": "noise_eps",
        "dgss": "data_games_ss", "dgsr": "data_games_sr",
        "dtl": "data_train_loops", "blocks": "blocks",
        "env_batch": "env_batch_per_device",
        "max_steps": "max_game_steps",
    }
    for arg, field in mapping.items():
        v = getattr(args, arg, None)
        if v is not None:
            over[field] = v
    for arg, field in (("allow_yield", "allow_yield"),
                       ("limit_reinforcement", "limit_reinforcement_moves"),
                       ("limit_attack", "limit_attack_moves"),
                       ("mirror_games", "mirror_games")):
        v = getattr(args, arg, None)
        if v is not None:
            over[field] = bool(v)
    over["compare_games"] = args.games
    if getattr(args, "fast", False):
        over["fast_infer"] = True
    if getattr(args, "int8", False):
        over["fast_infer_int8"] = True
    return cfg.replace(**over)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.coordinator is not None or args.nprocs is not None:
        # must run before any backend initialization
        from .parallel.distributed import initialize
        initialize(args.coordinator, args.nprocs, args.procid,
                   cpu_collectives=args.cpu_collectives)
    from .utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    if args.mode == "bench":
        import bench
        bench.main()
        return

    if args.mode == "watch":
        if "az" in (args.p1, args.p2):
            # AZ games step the B=1 JAX engine + MCTS on CPU (reference
            # GUI views any Game incl. AZ, board_gui.cpp:5-125)
            from .utils.watch import watch_game_az
            watch_game_az(args.p1, args.p2, seed=args.seed,
                          cfg=config_from_args(args),
                          ckpt_dir=Config().checkpoint_dir,
                          roles=(args.c1, args.c2), micro=args.micro,
                          pause=not args.no_pause)
        else:
            from .utils.watch import watch_game
            watch_game(args.p1, args.p2, seed=args.seed,
                       cfg=config_from_args(args), micro=args.micro,
                       pause=not args.no_pause)
        return

    cfg = config_from_args(args)
    # Dump effective settings like the reference (settings.h:198-210).
    import dataclasses
    import os
    os.makedirs(cfg.log_dir, exist_ok=True)
    with open(f"{cfg.log_dir}/settings.txt", "w") as f:
        for field in dataclasses.fields(cfg):
            f.write(f"{field.name}={getattr(cfg, field.name)}\n")

    from .training import actor as A

    if args.mode == "play" and args.p1 != "az":
        # heuristic-vs-heuristic matches run on the native CPU engine
        # (no network involved; reference executePlay with sp/rp players)
        if args.p2 == "az":
            raise SystemExit("put the az player in --p1")
        from .native import NativeEngine, available
        if available():
            eng = NativeEngine(cfg)
            res, rounds, steps = eng.play_games(args.p1, args.p2,
                                                args.games, args.seed)
            import numpy as np
            print(json.dumps({
                "mode": "play", "p1": args.p1, "p2": args.p2,
                "engine": "native",
                "games": int(res.shape[0]),
                "p0_wins": int((res == 0).sum()),
                "p1_wins": int((res == 1).sum()),
                "draws": int((res == -2).sum()),
                "micro_steps": steps,
            }))
        else:
            import jax
            from .agents import (AGENT_RANDOM, AGENT_SCRIPT,
                                 mirrored_initial_states, play_match,
                                 summarize)
            kinds = {"sp": AGENT_SCRIPT, "rp": AGENT_RANDOM}
            state0 = mirrored_initial_states(
                jax.random.PRNGKey(args.seed), args.games + args.games % 2)
            resm = play_match(jax.random.PRNGKey(args.seed + 1), state0,
                              kinds[args.p1], kinds[args.p2], cfg,
                              cfg.max_game_steps)
            print(json.dumps({"mode": "play", "p1": args.p1,
                              "p2": args.p2, "engine": "jax",
                              **summarize(resm)}))
        return

    from .training.trainer import Trainer

    trainer = Trainer(cfg, seed=args.seed)

    if args.mode == "play":
        trainer.train_state = trainer.ckpt.restore(args.c1,
                                                   trainer.train_state)
        trainer.gen_params = trainer.train_state.params
        trainer.gen_batch_stats = trainer.train_state.batch_stats
        if args.p2 == "az":
            res = trainer.play_az_vs_az(args.c2, args.games)
        else:
            opp = {"sp": A.OPP_SCRIPT, "rp": A.OPP_RANDOM}[args.p2]
            res = trainer.play(opp, args.games)
        print(json.dumps({"mode": "play", "p2": args.p2, **res}))
    elif args.mode == "train":
        trainer.train(iterations=args.ti)
    elif args.mode == "train-script":
        trainer.train_on_script(iterations=args.ti)
    elif args.mode == "train-data":
        trainer.train_on_data(loops=args.dtl)
    elif args.mode == "analysis":
        from .training.analysis import cross_validate
        report = cross_validate(cfg, f"{cfg.data_dir}/training_samples.npz",
                                seed=args.seed)
        print(json.dumps(report))


if __name__ == "__main__":
    main()
