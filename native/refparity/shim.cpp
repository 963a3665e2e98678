// C-ABI shim over the REFERENCE rules engine, compiled unmodified from
// /root/reference/src (state.cpp, land.cpp, alphazero_moves.cpp, ...)
// through a symlink shadow tree that swaps in a recording rng.h.
//
// Purpose (BASELINE.md north star): prove the JAX engine's transitions are
// trajectory-exact against the REAL reference code — not against
// builder-written oracles.  The harness drives State::newGame /
// UtilityNN::getValidMoves / UtilityNN::makeMove
// (reference: state.cpp:137-167, alphazero_moves.cpp:3-243) with a seeded
// engine, records every RNG draw, and exports full state snapshots; the
// Python side replays the identical (action, dice) stream through
// alphazero_risk_tpu.env.rules.step and diffs field-wise.
//
// Build: make -C native/refparity   (see Makefile; nothing from the
// reference tree is copied into the repo — sources are symlinked at
// build time and the artifacts are gitignored).

#include <cstdint>
#include <cstring>
#include <exception>
#include <string>

#include "shadow/src/risk_game/player/alpha_zero/alphazero_moves.h"
#include "shadow/src/risk_game/player/alpha_zero/neural_network/alphazero_nn_data.h"
#include "shadow/src/risk_game/player/script/script_player.h"
#include "shadow/src/risk_game/state/state.h"

static std::string g_last_error;

extern "C" {

void* ref_new_game(uint64_t seed)
{
    RNG.seed(seed);
    RNG.trace.clear();
    State* st = new State();
    st->newGame();
    return st;
}

void ref_free(void* p) { delete static_cast<State*>(p); }

void ref_seed(uint64_t seed) { RNG.seed(seed); }

// Snapshot layout (int64): see PyRefState in tests/refparity.py
// 0..41 owner, 42..83 army, then scalars, then per-player bitmasks.
void ref_export(void* p, int64_t* out)
{
    const State* st = static_cast<State*>(p);
    const Data& d = st->getData();
    for (int i = 0; i < DATA_TERRITORY; i++) {
        out[i] = d.landArmy[i].playerIndex;
        out[42 + i] = d.landArmy[i].army;
    }
    out[84] = d.round;
    out[85] = d.currentPlayerTurn;
    out[86] = d.cardSetsPlayed;
    out[87] = d.reinforcements;
    out[88] = static_cast<int64_t>(d.roundPhase);
    out[89] = static_cast<int64_t>(d.attackMobilizationFrom);
    out[90] = static_cast<int64_t>(d.attackMobilizationTo);
    out[91] = d.playerAllowedDrawCard ? 1 : 0;
    out[92] = d.attacksDuringTurn;
    out[93] = static_cast<int64_t>(d.playerStatus[0].playerCards);
    out[94] = static_cast<int64_t>(d.playerStatus[1].playerCards);
    out[95] = d.playerStatus[0].totalArmy;
    out[96] = d.playerStatus[1].totalArmy;
    out[97] = static_cast<int64_t>(d.drawnCardsBitMask);
    for (int pl = 0; pl < 2; pl++) {
        const PlayerStatus& ps = d.playerStatus[pl];
        int64_t* m = out + 98 + pl * 5;
        m[0] = static_cast<int64_t>(ps.ownedLands);
        m[1] = static_cast<int64_t>(ps.ownedLandsWithArmy);
        m[2] = static_cast<int64_t>(ps.ownedFullLands);
        m[3] = static_cast<int64_t>(ps.attackLands);
        m[4] = static_cast<int64_t>(ps.attackLandsWithArmy);
    }
    out[108] = st->gameStatus();
}

uint64_t ref_legal_mask(void* p)
{
    return UtilityNN::getValidMoves(*static_cast<State*>(p));
}

int ref_game_status(void* p)
{
    return static_cast<State*>(p)->gameStatus();
}

// Executes one 43-way action.  Fills draws_out with the recorded
// (kind, value) pairs the move consumed (kind 0=rInt, 1=rDice, 2=rFloat
// scaled by 1e9); returns the number of PAIRS, or -1 on a rules
// exception (message via ref_last_error).
int ref_make_move(void* p, int action, int32_t* draws_out, int cap)
{
    State* st = static_cast<State*>(p);
    RNG.trace.clear();
    try {
        UtilityNN::makeMove(*st, static_cast<LandIndex>(action));
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return -1;
    }
    int n = static_cast<int>(RNG.trace.size() / 2);
    int m = n < cap ? n : cap;
    std::memcpy(draws_out, RNG.trace.data(),
                sizeof(int32_t) * 2 * static_cast<size_t>(m));
    return n;
}

const char* ref_last_error() { return g_last_error.c_str(); }

// ---- the reference's OWN ScriptPlayer (script_player.cpp:17-227) ----
// The repo's three ScriptPlayer implementations agree with each other but
// deviate from the reference on DFS-pre-order fortify tie-breaks and
// unspecified-sort continent-priority ties (agents/script_agent.py:17-23).
// These exports let tools/ref_script_arena.py measure that drift against
// the real thing: a persistent ScriptPlayer per (game, seat) — Game
// builds one per seat per game (script_player.cpp buildGroup), and the
// priority vector's order carries across turns through std::sort ties, so
// a fresh instance per turn would NOT reproduce reference behavior.

void* ref_clone(void* p)
{
    return new State(*static_cast<State*>(p));
}

void* ref_script_new() { return new ScriptPlayer(); }

void ref_script_free(void* sp) { delete static_cast<ScriptPlayer*>(sp); }

// Plays ONE takeTurn call (a full game turn, or one setup placement pair
// during SETUP).  Returns the number of RNG pairs consumed, or -1 on a
// rules exception (message via ref_last_error).
int ref_script_take_turn(void* sp, void* p)
{
    State* st = static_cast<State*>(p);
    RNG.trace.clear();
    try {
        static_cast<ScriptPlayer*>(sp)->takeTurn(*st);
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return -1;
    }
    return static_cast<int>(RNG.trace.size() / 2);
}

// As above, but copies the recorded (kind, value) pairs into draws_out
// (same contract as ref_make_move) so the repo side can replay the turn
// with the identical dice stream.
int ref_script_take_turn_traced(void* sp, void* p, int32_t* draws_out,
                                int cap)
{
    int n = ref_script_take_turn(sp, p);
    if (n < 0) return n;
    int m = n < cap ? n : cap;
    std::memcpy(draws_out, RNG.trace.data(),
                sizeof(int32_t) * 2 * static_cast<size_t>(m));
    return n;
}

// Primitive move ops — the exact State calls ScriptPlayer::takeTurn
// makes (script_player.cpp: reinforcementMove/attackMove/
// attackReinforcementMove/fortifyMove/nextPlayerGameTurn + the
// GameHelper::playCards trade and the two setup moves).  These let
// tools/ref_script_arena.py --head2head play the REPO ScriptPlayer's
// decisions through the reference engine, so repo-SP-vs-reference-SP
// games run entirely under reference rules with engine-drawn dice.
// Returns: attackMove -> 1 if the land was captured else 0; others 0;
// -1 on a rules exception (message via ref_last_error).
int ref_prim(void* p, int op, int a, int b, int c)
{
    State* st = static_cast<State*>(p);
    try {
        switch (op) {
        case 0: GameHelper::playCards(*st); return 0;
        case 1: st->reinforcementMove(static_cast<land_army_t>(c),
                                      static_cast<LandIndex>(a));
                return 0;
        case 2: return st->attackMove(static_cast<LandIndex>(a),
                                      static_cast<LandIndex>(b)) ? 1 : 0;
        case 3: st->attackReinforcementMove(
                    static_cast<land_army_t>(c));
                return 0;
        case 4: st->fortifyMove(static_cast<land_army_t>(c),
                                static_cast<LandIndex>(a),
                                static_cast<LandIndex>(b));
                return 0;
        case 5: st->nextPlayerGameTurn(); return 0;
        case 6: st->setupReinforcementMove(static_cast<LandIndex>(a));
                return 0;
        case 7: st->setupReinforcementNeutralMove(
                    static_cast<LandIndex>(a));
                return 0;
        }
        g_last_error = "unknown op";
        return -1;
    } catch (const std::exception& e) {
        g_last_error = e.what();
        return -1;
    }
}

// The reference's featurization: scalar/land features computed by the
// reference's OWN NNInputData ctor (alphazero_nn_data.cpp:165-196,
// compiled into this shim), laid out [MAP_Y, MAP_X, TF_INPUT_FEATURES]
// exactly as setInStateTensor does (alphazero_nn.cpp:31-67 — that file
// needs TensorFlow so the 20-line broadcast loop is mirrored here with
// the same IF_* channel constants).  For the machine featurize-parity
// check (tests/test_refparity.py).
int ref_featurize(void* p, float* out, int cap)
{
    const State* st = static_cast<State*>(p);
    NNInputData d(*st);
    const int n = MAP_Y * MAP_X * TF_INPUT_FEATURES;
    if (cap < n) return n;
    const int cur = d.playerIndex;
    const int enemy = cur == 0 ? 1 : 0;
    for (int y = 0; y < MAP_Y; y++) {
        for (int x = 0; x < MAP_X; x++) {
            const LandArmy& la = d.land[y * MAP_X + x];
            const float army = float(la.army) / LAND_ARMY_MAX;
            float* c = out + (y * MAP_X + x) * TF_INPUT_FEATURES;
            c[IF_CURRENT_PLAYER] = la.playerIndex == cur ? army : 0.0f;
            c[IF_ENEMY_PLAYER] = la.playerIndex == enemy ? army : 0.0f;
            c[IF_NEUTRAL_PLAYER] =
                la.playerIndex == NEUTRAL_PLAYER ? army : 0.0f;
            c[IF_REINFORCEMENT_SHARE] = d.featureReinforcementShare;
            c[IF_ATTACKS_DURING_TURN] = d.featureAttackFrequency;
            c[IF_CAN_DRAW_CARD] = d.featureCanDrawCard;
            c[IF_PHASE_SETUP] = d.featureIsPhaseSetup;
            c[IF_PHASE_SETUP_NEUTRAL] = d.featureIsPhaseSetupNeutral;
            c[IF_PHASE_REINFORCEMENT] = d.featureIsPhaseReinforcement;
            c[IF_PHASE_ATTACK] = d.featureIsPhaseAttack;
            c[IF_PHASE_ATTACK_MOBILIZATION] =
                d.featureIsPhaseAttackMobilization;
            c[IF_PHASE_FORTIFY] = d.featureIsPhaseFortify;
            c[IF_ARMY_SHARE] = d.featureArmyShare;
        }
    }
    return n;
}

void ref_set_current_player(void* p, int player)
{
    static_cast<State*>(p)->setCurrentPlayerTurn(
        static_cast<int8_t>(player));
}

void ref_invert_players(void* p)
{
    static_cast<State*>(p)->invertPlayers();
}

void ref_consistency_check(void* p)
{
    static_cast<State*>(p)->consistencyCheck();
    static_cast<State*>(p)->consistencyCheckArmyValue();
}

}  // extern "C"
