// riskcore: native scalar Risk rules engine + heuristic players.
//
// Host-side runtime component of the TPU framework: a fast C++ engine with
// a C ABI used for (a) randomized cross-validation of the vectorized JAX
// engine at scale, (b) CPU-native Script/Random match generation (the
// reference's "play sp vs sp" config runs off-device), and (c) the data
// path backing the replay store. Semantics transcribed from the reference
// implementation (src/risk_game/state/state.cpp, player/alpha_zero/
// alphazero_moves.cpp, player/script/script_player.cpp,
// player/random/random_player.cpp) — behavior-identical to the Python
// oracle in alphazero_risk_tpu/env/oracle.py, which is the tested spec.
//
// Build: g++ -O3 -shared -fPIC -std=c++20 riskcore.cpp -o libriskcore.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>

namespace {

constexpr int NUM_LANDS = 42;
constexpr int SKIP = 42;
constexpr int NEUTRAL = 2;

// Phases (reference state.h:49-57)
enum Phase : int8_t {
  SETUP = 0,
  SETUP_NEUTRAL = 1,
  REINFORCEMENT = 2,
  ATTACK = 3,
  ATTACK_MOBILIZATION = 4,
  FORTIFY = 5,
};

// Adjacency in reference declaration order (land.cpp:246-297).
const int8_t NEIGHBORS[NUM_LANDS][7] = {
    {1, 3, 29, -1},          {0, 3, 4, 2, -1},      {1, 4, 5, 13, -1},
    {0, 1, 4, 6, -1},        {1, 3, 6, 7, 5, 2, -1}, {4, 7, 2, -1},
    {3, 4, 7, 8, -1},        {8, 6, 4, 5, -1},      {6, 7, 9, -1},
    {8, 10, 11, -1},         {9, 11, 12, -1},       {9, 10, 12, 20, -1},
    {10, 11, -1},            {2, 14, 15, -1},       {13, 19, 15, 17, -1},
    {13, 14, 16, 17, -1},    {15, 17, 18, 35, 33, 26, -1},
    {15, 14, 18, 19, 16, -1}, {19, 17, 16, 20, 21, 35, -1},
    {20, 14, 18, 17, -1},    {11, 19, 18, 21, 23, 22, -1},
    {18, 20, 23, 35, -1},    {20, 23, 24, -1},
    {21, 20, 22, 24, 25, 35, -1},                   {22, 23, 25, -1},
    {24, 23, -1},            {16, 33, 34, 27, -1},
    {26, 34, 32, 30, 28, -1}, {27, 30, 29, -1},     {28, 30, 32, 31, 0, -1},
    {28, 29, 32, 27, -1},    {29, 32, -1},          {27, 30, 29, 31, 34, -1},
    {16, 26, 34, 36, 35, -1}, {32, 27, 26, 33, 36, 37, -1},
    {21, 23, 18, 16, 33, 36, -1},                   {35, 33, 34, 37, -1},
    {36, 34, 38, -1},        {37, 39, 40, -1},      {38, 41, 40, -1},
    {41, 39, 38, -1},        {40, 39, -1},
};

// Continents: [start, end) land ranges + bonus (land_set.cpp:12-30).
const int CONT_LO[6] = {0, 9, 13, 20, 26, 38};
const int CONT_HI[6] = {9, 13, 20, 26, 38, 42};
const int CONT_BONUS[6] = {5, 2, 5, 3, 7, 2};
// Tie rank: descending highest land index (game_helper.cpp:19-36).
const int CONT_TIE_RANK[6] = {5, 4, 3, 2, 1, 0};
// ScriptPlayer walks lands in land_set.cpp declaration order.
const int8_t SCRIPT_ORDER[6][13] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, -1},
    {9, 10, 11, 12, -1},
    {13, 14, 15, 16, 17, 19, 18, -1},
    {20, 21, 22, 24, 25, 23, -1},
    {26, 33, 35, 36, 27, 28, 29, 30, 31, 32, 34, 37, -1},
    {38, 39, 40, 41, -1},
};

}  // namespace

extern "C" {

// Mirror of the GameState pytree / reference Data (state.h:86-105).
struct RiskState {
  int8_t owner[NUM_LANDS];
  int8_t army[NUM_LANDS];
  int8_t phase;
  int16_t round;
  int8_t cur_player;
  int16_t reinforcements;
  int16_t cards[2];
  int16_t card_sets_played;
  int8_t mob_from;
  int8_t mob_to;
  int8_t can_draw_card;
  int16_t attacks_during_turn;
};

struct RiskConfig {
  int land_army_max;        // 32
  int min_unit_move;        // 3
  int max_game_rounds;      // 58
  int allow_yield;          // 1
  int limit_reinforcement;  // 1
  int limit_attack;         // 0
  int fast_mobilization;    // 1
};

}  // extern "C"

namespace {

inline bool owned_by(const RiskState& s, int l, int p) {
  return s.owner[l] == p;
}

int count_lands(const RiskState& s, int p) {
  int n = 0;
  for (int l = 0; l < NUM_LANDS; l++) n += s.owner[l] == p;
  return n;
}

// calculateReinforcementValue (state.cpp:457-491)
int calc_reinforcement(const RiskState& s, int p) {
  int cnt = 0;
  int r = 0;
  for (int c = 0; c < 6; c++) {
    bool all = true;
    for (int l = CONT_LO[c]; l < CONT_HI[c]; l++) {
      if (s.owner[l] == p) cnt++;
      else all = false;
    }
    if (all) r += CONT_BONUS[c];
  }
  r += cnt / 3;
  return r < 3 ? 3 : r;
}

bool attack_lands_with_army_any(const RiskState& s, int p) {
  for (int l = 0; l < NUM_LANDS; l++) {
    if (s.owner[l] == p) continue;
    for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
      int n = NEIGHBORS[l][i];
      if (s.owner[n] == p && s.army[n] >= 2) return true;
    }
  }
  return false;
}

// gotoAttack (state.cpp:20-40)
void goto_attack(RiskState& s) {
  s.reinforcements = 0;
  s.mob_from = -1;
  s.mob_to = -1;
  s.phase = attack_lands_with_army_any(s, s.cur_player) ? ATTACK : FORTIFY;
}

// nextPlayerGameTurn (state.cpp:748-766)
void end_turn(RiskState& s) {
  if (s.can_draw_card) {
    s.cards[s.cur_player] += 1;
    s.can_draw_card = 0;
  }
  s.round += 1;
  s.cur_player = 1 - s.cur_player;
  s.attacks_during_turn = 0;
  s.phase = REINFORCEMENT;
  s.reinforcements = calc_reinforcement(s, s.cur_player);
}

// playCards, STATE_SIMPLE_CARDS (state.cpp:1090-1117)
void play_cards(RiskState& s) {
  if (s.cards[s.cur_player] >= 3) {
    s.cards[s.cur_player] -= 3;
    s.card_sets_played += 1;
    int k = s.card_sets_played;
    static const int sched[7] = {0, 4, 6, 8, 10, 12, 15};
    s.reinforcements += k <= 6 ? sched[k] : 15 + (k - 6) * 5;
  }
}

int move_amount(int budget, const RiskConfig& cfg) {
  if (cfg.fast_mobilization) {
    int half = budget / 2;
    if (half < cfg.min_unit_move)
      return budget < cfg.min_unit_move ? budget : cfg.min_unit_move;
    return half;
  }
  return budget < cfg.min_unit_move ? budget : cfg.min_unit_move;
}

// attackMove core (state.cpp:769-918); dice[0..2] attacker, dice[3..4]
// defender, values 1..6.
void apply_attack(RiskState& s, int frm, int li, const int32_t* dice,
                  const RiskConfig& cfg) {
  int p = s.cur_player;
  s.attacks_during_turn += 1;
  int a = s.army[frm], d = s.army[li];
  int att_n = a >= 4 ? 3 : (a == 3 ? 2 : 1);
  int def_n = d >= 2 ? 2 : 1;
  int att[3], dfn[2];
  for (int i = 0; i < att_n; i++) att[i] = dice[i];
  for (int i = 0; i < def_n; i++) dfn[i] = dice[3 + i];
  std::sort(att, att + att_n, std::greater<int>());
  std::sort(dfn, dfn + def_n, std::greater<int>());
  int units = att_n;
  if (att[0] > dfn[0]) d -= 1;
  else { a -= 1; units -= 1; }
  if (att_n >= 2 && def_n == 2) {
    if (att[1] > dfn[1]) d -= 1;
    else { a -= 1; units -= 1; }
  }
  if (d == 0) {
    a -= units;
    if (a > 1) {
      s.phase = ATTACK_MOBILIZATION;
      s.mob_from = frm;
      s.mob_to = li;
    }
    s.can_draw_card = 1;
    s.army[frm] = a;
    s.army[li] = units;
    s.owner[li] = p;
  } else {
    s.army[frm] = a;
    s.army[li] = d;
  }
  if (s.phase == ATTACK && !attack_lands_with_army_any(s, p))
    s.phase = FORTIFY;
}

void apply_reinforcement(RiskState& s, int li, int amount) {
  s.reinforcements -= amount;
  s.army[li] += amount;
  if (s.reinforcements == 0) goto_attack(s);
}

void apply_mobilization(RiskState& s, int amount) {
  s.army[s.mob_from] -= amount;
  s.army[s.mob_to] += amount;
  if (s.army[s.mob_from] == 1) goto_attack(s);
}

void component_of(const RiskState& s, int p, int src, bool out[NUM_LANDS]) {
  std::memset(out, 0, NUM_LANDS);
  int stack[NUM_LANDS], top = 0;
  out[src] = true;
  stack[top++] = src;
  while (top) {
    int l = stack[--top];
    for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
      int n = NEIGHBORS[l][i];
      if (s.owner[n] == p && !out[n]) {
        out[n] = true;
        stack[top++] = n;
      }
    }
  }
}

// Recursive flood-fill visit order (reference
// GameHelper::LandSetMovement::add, game_helper.cpp:51-82): pre-order,
// neighbours in declaration order.  Iterative with an explicit frame
// stack to keep the exact recursive ordering.
void dfs_preorder(const RiskState& s, int p, int root, int out[NUM_LANDS],
                  int* n_out) {
  *n_out = 0;
  if (root < 0 || s.owner[root] != p) return;
  bool seen[NUM_LANDS] = {false};
  int node[NUM_LANDS], edge[NUM_LANDS], top = 0;
  seen[root] = true;
  out[(*n_out)++] = root;
  node[top] = root;
  edge[top] = 0;
  while (top >= 0) {
    int l = node[top];
    int i = edge[top]++;
    if (NEIGHBORS[l][i] < 0) {
      top--;
      continue;
    }
    int n = NEIGHBORS[l][i];
    if (s.owner[n] == p && !seen[n]) {
      seen[n] = true;
      out[(*n_out)++] = n;
      top++;
      node[top] = n;
      edge[top] = 0;
    }
  }
}

// splitmix64 for self-contained play (replaces the reference's global
// std::default_random_engine, rng.h:38-50)
struct Rng {
  uint64_t x;
  explicit Rng(uint64_t seed) : x(seed + 0x9E3779B97F4A7C15ULL) {}
  uint64_t next() {
    uint64_t z = (x += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  }
  int dice() { return 1 + (int)(next() % 6); }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int choice_n(int n) { return (int)(uniform() * n); }
};

}  // namespace

extern "C" {

int risk_game_status(const RiskState* s, const RiskConfig* cfg) {
  // gameStatus (state.cpp:518-565): -1 running, -2 draw, else winner.
  int p0 = count_lands(*s, 0);
  if (p0 == 0) return 1;
  int p1 = count_lands(*s, 1);
  if (p1 == 0) return 0;
  if (cfg->allow_yield) {
    if (p0 >= 30) return 0;
    if (p1 >= 30) return 1;
  }
  if (s->round > cfg->max_game_rounds) {
    if (p0 > p1) return 0;
    if (p0 < p1) return 1;
    return -2;
  }
  return -1;
}

void risk_new_game(RiskState* s, const int32_t* permutation) {
  // State::newGame (state.cpp:137-167): deal cycle [P0, P1, neutral].
  std::memset(s, 0, sizeof(RiskState));
  static const int8_t pattern[3] = {0, 1, NEUTRAL};
  for (int i = 0; i < NUM_LANDS; i++) {
    s->owner[permutation[i]] = pattern[i % 3];
    s->army[permutation[i]] = 1;
  }
  s->phase = SETUP;
  s->round = 1;
  s->reinforcements = 52;
  s->mob_from = -1;
  s->mob_to = -1;
}

void risk_legal_actions(const RiskState* s, const RiskConfig* cfg,
                        uint8_t* mask /*43*/) {
  // getValidMoves (alphazero_moves.cpp:3-70)
  std::memset(mask, 0, 43);
  int p = s->cur_player;
  switch (s->phase) {
    case SETUP:
    case REINFORCEMENT: {
      bool any = false;
      bool border_any = false;
      bool base[NUM_LANDS], border[NUM_LANDS];
      for (int l = 0; l < NUM_LANDS; l++) {
        base[l] = s->owner[l] == p && s->army[l] < cfg->land_army_max;
        any |= base[l];
        border[l] = false;
      }
      if (!any) {
        mask[SKIP] = 1;
        return;
      }
      if (cfg->limit_reinforcement) {
        int e = 1 - p;
        for (int l = 0; l < NUM_LANDS; l++) {
          if (!base[l]) continue;
          for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
            int n = NEIGHBORS[l][i];
            if (s->owner[n] == e || s->owner[n] == NEUTRAL) {
              border[l] = true;
              border_any = true;
              break;
            }
          }
        }
        for (int l = 0; l < NUM_LANDS; l++)
          mask[l] = border_any ? border[l] : base[l];
      } else {
        for (int l = 0; l < NUM_LANDS; l++) mask[l] = base[l];
      }
      return;
    }
    case SETUP_NEUTRAL:
      for (int l = 0; l < NUM_LANDS; l++) mask[l] = s->owner[l] == NEUTRAL;
      return;
    case ATTACK: {
      bool any = false;
      for (int l = 0; l < NUM_LANDS; l++) {
        if (s->owner[l] == p) continue;
        for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
          int n = NEIGHBORS[l][i];
          if (s->owner[n] == p && s->army[n] >= 2) {
            mask[l] = 1;
            any = true;
            break;
          }
        }
      }
      if (cfg->limit_attack) {
        if (!any) mask[SKIP] = 1;
      } else {
        mask[SKIP] = 1;
      }
      return;
    }
    case ATTACK_MOBILIZATION:
      mask[s->mob_from] = 1;
      mask[s->mob_to] = 1;
      return;
    case FORTIFY: {
      int e = 1 - p;
      for (int l = 0; l < NUM_LANDS; l++) {
        if (s->owner[l] != p) continue;
        if (cfg->limit_reinforcement) {
          for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
            if (s->owner[NEIGHBORS[l][i]] == e) {
              mask[l] = 1;
              break;
            }
          }
        } else {
          mask[l] = 1;
        }
      }
      mask[SKIP] = 1;
      return;
    }
  }
}

void risk_step(RiskState* s, int action, const int32_t* dice,
               const RiskConfig* cfg) {
  // UtilityNN::makeMove (alphazero_moves.cpp:72-233)
  if (risk_game_status(s, cfg) != -1) return;
  int p = s->cur_player;
  switch (s->phase) {
    case SETUP:
      s->reinforcements -= 2;
      s->army[action] += 2;
      s->phase = SETUP_NEUTRAL;
      return;
    case SETUP_NEUTRAL: {
      s->army[action] += 1;
      s->round += 1;
      s->cur_player = 1 - p;
      s->phase = SETUP;
      if (s->reinforcements == 0) {
        s->phase = REINFORCEMENT;
        s->reinforcements = calc_reinforcement(*s, s->cur_player);
      }
      return;
    }
    case REINFORCEMENT: {
      if (action == SKIP) {
        goto_attack(*s);
        return;
      }
      play_cards(*s);
      int amount = move_amount(s->reinforcements, *cfg);
      int space = cfg->land_army_max - s->army[action];
      if (amount > space) amount = space;
      apply_reinforcement(*s, action, amount);
      return;
    }
    case ATTACK: {
      if (action == SKIP) {
        s->phase = FORTIFY;
        return;
      }
      // best attack-from: first strict max in neighbour-list order
      // (alphazero_moves.cpp:127-142)
      int best_army = 0, frm = -1;
      for (int i = 0; NEIGHBORS[action][i] >= 0; i++) {
        int n = NEIGHBORS[action][i];
        if (s->owner[n] == p && s->army[n] - 1 > best_army) {
          best_army = s->army[n] - 1;
          frm = n;
        }
      }
      apply_attack(*s, frm, action, dice, *cfg);
      return;
    }
    case ATTACK_MOBILIZATION: {
      if (action == s->mob_from) {
        goto_attack(*s);
        return;
      }
      int value = s->army[s->mob_from] - 1;
      apply_mobilization(*s, move_amount(value, *cfg));
      return;
    }
    case FORTIFY: {
      if (action != SKIP && s->army[action] < cfg->land_army_max) {
        bool comp[NUM_LANDS];
        component_of(*s, p, action, comp);
        // First-strict-max over the reference's recursive flood-fill
        // pre-order rooted at the lowest-index land of the component
        // (game_helper.cpp:51-105, alphazero_moves.cpp:188-221).
        int root = -1;
        for (int l = 0; l < NUM_LANDS; l++)
          if (comp[l]) { root = l; break; }
        int order[NUM_LANDS], n_order = 0;
        dfs_preorder(*s, p, root, order, &n_order);
        int best_int = 0, from_int = -1, best_ext = 0, from_ext = -1;
        for (int k = 0; k < n_order; k++) {
          int l = order[k];
          if (l == action) continue;
          int value = s->army[l] - 1;
          bool interior = true;
          for (int i = 0; NEIGHBORS[l][i] >= 0; i++)
            if (s->owner[NEIGHBORS[l][i]] != p) {
              interior = false;
              break;
            }
          if (interior) {
            if (value > best_int) { best_int = value; from_int = l; }
          } else {
            if (value > best_ext) { best_ext = value; from_ext = l; }
          }
        }
        int frm = from_int >= 0 ? from_int : from_ext;
        int val = from_int >= 0 ? best_int : best_ext;
        if (frm >= 0) {
          int space = cfg->land_army_max - s->army[action];
          if (val > space) val = space;
          s->army[frm] -= val;
          s->army[action] += val;
        }
      }
      end_turn(*s);
      return;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Scripted / random players (script_player.cpp, random_player.cpp) and a
// native match runner for CPU data generation and benchmarking.
// ---------------------------------------------------------------------------

namespace {

struct ScriptCarry {
  int attack_to = -1;
  int attack_from = -1;
};

int select_target(const RiskState& s, const bool owned[NUM_LANDS],
                  const bool attack_mask[NUM_LANDS]) {
  // continent priority + first attackable in declared order
  // (script_player.cpp:17-50)
  int best_c = -1;
  long best_key = 0;
  for (int c = 0; c < 6; c++) {
    int unowned = 0, attackable = 0;
    for (int l = CONT_LO[c]; l < CONT_HI[c]; l++) {
      if (!owned[l]) {
        unowned++;
        if (attack_mask[l]) attackable++;
      }
    }
    if (attackable == 0) continue;
    long key = (long)unowned * 1000 - attackable * 10 + CONT_TIE_RANK[c];
    if (best_c < 0 || key < best_key) {
      best_key = key;
      best_c = c;
    }
  }
  if (best_c < 0) return -1;
  for (int i = 0; SCRIPT_ORDER[best_c][i] >= 0; i++) {
    int l = SCRIPT_ORDER[best_c][i];
    if (attack_mask[l]) return l;
  }
  return -1;
}

int select_from(const RiskState& s, int target,
                const bool owned_mask[NUM_LANDS]) {
  // max-army owned neighbour, first-in-list ties (script_player.cpp:52-69)
  int best_army = 0, best = -1;
  for (int i = 0; NEIGHBORS[target][i] >= 0; i++) {
    int n = NEIGHBORS[target][i];
    if (owned_mask[n] && s.army[n] > best_army) {
      best_army = s.army[n];
      best = n;
    }
  }
  return best;
}

void make_masks(const RiskState& s, int p, bool owned[], bool owned_wa[],
                bool attack[], bool attack_wa[], bool enemy_attack[],
                bool neutral_attack[]) {
  int e = 1 - p;
  for (int l = 0; l < NUM_LANDS; l++) {
    owned[l] = s.owner[l] == p;
    owned_wa[l] = owned[l] && s.army[l] >= 2;
  }
  for (int l = 0; l < NUM_LANDS; l++) {
    attack[l] = attack_wa[l] = enemy_attack[l] = neutral_attack[l] = false;
    for (int i = 0; NEIGHBORS[l][i] >= 0; i++) {
      int n = NEIGHBORS[l][i];
      if (!owned[l]) {
        if (s.owner[n] == p) attack[l] = true;
        if (s.owner[n] == p && s.army[n] >= 2) attack_wa[l] = true;
      }
      if (s.owner[l] != e && s.owner[n] == e) enemy_attack[l] = true;
      if (s.owner[l] != NEUTRAL && s.owner[n] == NEUTRAL)
        neutral_attack[l] = true;
    }
  }
}

// One script micro-step (mirror of agents/script_agent.py /
// script_player.cpp). Returns the recorded 43-action or -1 for no record.
int script_micro_step(RiskState& s, ScriptCarry& carry, bool reset,
                      Rng& rng, const RiskConfig& cfg) {
  if (reset) carry = ScriptCarry();
  int p = s.cur_player;
  bool owned[NUM_LANDS], owned_wa[NUM_LANDS], attack[NUM_LANDS],
      attack_wa[NUM_LANDS], enemy_attack[NUM_LANDS],
      neutral_attack[NUM_LANDS];
  make_masks(s, p, owned, owned_wa, attack, attack_wa, enemy_attack,
             neutral_attack);
  int32_t dice[5];
  switch (s.phase) {
    case SETUP: {
      int t = select_target(s, owned, attack);
      int f = select_from(s, t, owned);
      s.reinforcements -= 2;
      s.army[f] += 2;
      s.phase = SETUP_NEUTRAL;
      return f;
    }
    case SETUP_NEUTRAL: {
      // prefer neutral lands bordering the enemy and not us
      // (script_player.cpp:180-200)
      int pool[NUM_LANDS], n1 = 0, n2 = 0, n3 = 0;
      int p1[NUM_LANDS], p2[NUM_LANDS];
      for (int l = 0; l < NUM_LANDS; l++) {
        if (s.owner[l] != NEUTRAL) continue;
        pool[n3++] = l;
        if (enemy_attack[l]) {
          p2[n2++] = l;
          if (!attack[l]) p1[n1++] = l;
        }
      }
      int li = n1 ? p1[rng.choice_n(n1)]
                  : (n2 ? p2[rng.choice_n(n2)] : pool[rng.choice_n(n3)]);
      risk_step(&s, li, dice, &cfg);
      return li;
    }
    case REINFORCEMENT: {
      if (carry.attack_to < 0) {
        play_cards(s);
        carry.attack_to = select_target(s, owned, attack);
        carry.attack_from = select_from(s, carry.attack_to, owned);
      }
      bool onf[NUM_LANDS];
      bool any_onf = false;
      for (int l = 0; l < NUM_LANDS; l++) {
        onf[l] = owned[l] && s.army[l] < cfg.land_army_max;
        any_onf |= onf[l];
      }
      if (!any_onf) {
        goto_attack(s);
        return -1;
      }
      int to_r = -1;
      if (onf[carry.attack_from]) {
        to_r = carry.attack_from;
      } else {
        for (int i = 0; NEIGHBORS[carry.attack_to][i] >= 0 && to_r < 0; i++)
          if (onf[NEIGHBORS[carry.attack_to][i]])
            to_r = NEIGHBORS[carry.attack_to][i];
        if (to_r < 0)
          for (int l = 0; l < NUM_LANDS && to_r < 0; l++)
            if (onf[l] && (enemy_attack[l] || neutral_attack[l])) to_r = l;
        if (to_r < 0)
          for (int l = 0; l < NUM_LANDS && to_r < 0; l++)
            if (onf[l]) to_r = l;
      }
      int amt = std::min({(int)cfg.min_unit_move, (int)s.reinforcements,
                          cfg.land_army_max - s.army[to_r]});
      apply_reinforcement(s, to_r, amt);
      return to_r;
    }
    case ATTACK: {
      bool to_ok = carry.attack_to >= 0 && s.owner[carry.attack_to] != p;
      bool from_ok = carry.attack_from >= 0 &&
                     s.owner[carry.attack_from] == p &&
                     s.army[carry.attack_from] >= 2;
      if (!(to_ok && from_ok)) {
        carry.attack_to = select_target(s, owned, attack_wa);
        carry.attack_from = select_from(s, carry.attack_to, owned_wa);
      }
      for (int i = 0; i < 5; i++) dice[i] = rng.dice();
      apply_attack(s, carry.attack_from, carry.attack_to, dice, cfg);
      return carry.attack_to;
    }
    case ATTACK_MOBILIZATION: {
      int amt = std::min((int)s.army[s.mob_from] - 1, cfg.min_unit_move);
      int rec = s.mob_to;
      apply_mobilization(s, amt);
      return rec;
    }
    case FORTIFY: {
      bool any_wa = false;
      for (int l = 0; l < NUM_LANDS; l++) any_wa |= owned_wa[l];
      int rec = -1;
      if (any_wa) {
        // best component by max interior stack (game_helper.cpp:40-109)
        bool seen[NUM_LANDS] = {false};
        int best_from = -1, best_to = -1, best_amt = 0, best_label = 99;
        for (int l = 0; l < NUM_LANDS; l++) {
          if (!owned[l] || seen[l]) continue;
          bool comp[NUM_LANDS];
          component_of(s, p, l, comp);
          int from_amt = 0, from_l = -1, to_cnt = 0, to_l = -1;
          for (int c = 0; c < NUM_LANDS; c++) {
            if (!comp[c]) continue;
            seen[c] = true;
            int outside = 0;
            for (int i = 0; NEIGHBORS[c][i] >= 0; i++)
              outside += s.owner[NEIGHBORS[c][i]] != p;
            if (outside == 0) {
              if (s.army[c] > from_amt) { from_amt = s.army[c]; from_l = c; }
            } else {
              if (outside > to_cnt) { to_cnt = outside; to_l = c; }
            }
          }
          if (from_amt > best_amt ||
              (from_amt == best_amt && l < best_label)) {
            best_amt = from_amt;
            best_label = l;
            best_from = from_l;
            best_to = to_l;
          }
        }
        if (best_amt > 0 && best_to >= 0) {
          int amt = std::min((int)s.army[best_from] - 1,
                             cfg.land_army_max - s.army[best_to]);
          s.army[best_from] -= amt;
          s.army[best_to] += amt;
          rec = best_to;
        } else {
          rec = SKIP;
        }
      }
      end_turn(s);
      return rec;
    }
  }
  return -1;
}

// One random micro-step (random_player.cpp:22-111).
int random_micro_step(RiskState& s, Rng& rng, const RiskConfig& cfg) {
  int p = s.cur_player;
  int32_t dice[5];
  bool owned[NUM_LANDS], owned_wa[NUM_LANDS], attack[NUM_LANDS],
      attack_wa[NUM_LANDS], enemy_attack[NUM_LANDS],
      neutral_attack[NUM_LANDS];
  make_masks(s, p, owned, owned_wa, attack, attack_wa, enemy_attack,
             neutral_attack);
  auto pick = [&](const bool mask[NUM_LANDS], bool with_skip) -> int {
    int opts[NUM_LANDS + 1], n = 0;
    for (int l = 0; l < NUM_LANDS; l++)
      if (mask[l]) opts[n++] = l;
    if (with_skip) opts[n++] = SKIP;
    return opts[rng.choice_n(n)];
  };
  switch (s.phase) {
    case SETUP: {
      int li = pick(owned, false);
      s.reinforcements -= 2;
      s.army[li] += 2;
      s.phase = SETUP_NEUTRAL;
      return li;
    }
    case SETUP_NEUTRAL: {
      bool neutral[NUM_LANDS];
      for (int l = 0; l < NUM_LANDS; l++) neutral[l] = s.owner[l] == NEUTRAL;
      int li = pick(neutral, false);
      risk_step(&s, li, dice, &cfg);
      return li;
    }
    case REINFORCEMENT: {
      play_cards(s);
      bool onf[NUM_LANDS];
      for (int l = 0; l < NUM_LANDS; l++)
        onf[l] = owned[l] && s.army[l] < cfg.land_army_max;
      int li = pick(onf, false);
      apply_reinforcement(s, li, 1);
      return li;
    }
    case ATTACK: {
      int c = pick(attack_wa, true);
      if (c == SKIP) {
        s.phase = FORTIFY;
        return SKIP;
      }
      bool frm_mask[NUM_LANDS] = {false};
      for (int i = 0; NEIGHBORS[c][i] >= 0; i++)
        if (owned_wa[NEIGHBORS[c][i]]) frm_mask[NEIGHBORS[c][i]] = true;
      int frm = pick(frm_mask, false);
      for (int i = 0; i < 5; i++) dice[i] = rng.dice();
      apply_attack(s, frm, c, dice, cfg);
      return c;
    }
    case ATTACK_MOBILIZATION: {
      if (rng.uniform() > 0.5) {
        int amt = std::min((int)s.army[s.mob_from] - 1, cfg.min_unit_move);
        int rec = s.mob_to;
        apply_mobilization(s, amt);
        return rec;
      }
      int rec = s.mob_from;
      goto_attack(s);
      return rec;
    }
    case FORTIFY: {
      bool onf[NUM_LANDS];
      for (int l = 0; l < NUM_LANDS; l++)
        onf[l] = owned[l] && s.army[l] < cfg.land_army_max;
      int c = pick(onf, true);
      if (c != SKIP) {
        bool comp[NUM_LANDS];
        component_of(s, p, c, comp);
        bool cand[NUM_LANDS];
        bool any = false;
        for (int l = 0; l < NUM_LANDS; l++) {
          cand[l] = comp[l] && l != c && owned_wa[l];
          any |= cand[l];
        }
        if (any) {
          int frm = pick(cand, false);
          int max_amt = std::min((int)s.army[frm] - 1,
                                 cfg.land_army_max - s.army[c]);
          int amt = (int)(rng.uniform() * max_amt);
          s.army[frm] -= amt;
          s.army[c] += amt;
        }
      }
      end_turn(s);
      return c;
    }
  }
  return -1;
}

}  // namespace

extern "C" {

// Play n mirrored games agent0-vs-agent1 (0=script, 1=random).
// results: [n] game statuses. Returns total micro-steps executed.
long risk_play_games(int agent0, int agent1, int n_games, uint64_t seed,
                     const RiskConfig* cfg, int32_t* results,
                     int32_t* rounds) {
  Rng rng(seed);
  long steps = 0;
  for (int g = 0; g < n_games; g += 2) {
    int32_t perm[NUM_LANDS];
    for (int i = 0; i < NUM_LANDS; i++) perm[i] = i;
    for (int i = NUM_LANDS - 1; i > 0; i--)
      std::swap(perm[i], perm[rng.choice_n(i + 1)]);
    for (int half = 0; half < 2 && g + half < n_games; half++) {
      RiskState s;
      risk_new_game(&s, perm);
      if (half == 1) {
        // mirrored pair (game.cpp:170-191)
        for (int l = 0; l < NUM_LANDS; l++)
          if (s.owner[l] != NEUTRAL) s.owner[l] = 1 - s.owner[l];
        s.cur_player = 1;
      }
      ScriptCarry carry;
      int prev_player = -1;
      while (risk_game_status(&s, cfg) == -1) {
        int mover = s.cur_player;
        bool reset = mover != prev_player;
        prev_player = mover;
        int agent = mover == 0 ? agent0 : agent1;
        if (agent == 0)
          script_micro_step(s, carry, reset, rng, *cfg);
        else
          random_micro_step(s, rng, *cfg);
        steps++;
      }
      results[g + half] = risk_game_status(&s, cfg);
      rounds[g + half] = s.round;
    }
  }
  return steps;
}

// Random-legal-move trajectory driver for cross-validation against the
// JAX engine: consumes caller-provided dice/choices so both sides can be
// driven from one stream.
void risk_step_traj(RiskState* s, int action, const int32_t* dice,
                    const RiskConfig* cfg) {
  risk_step(s, action, dice, cfg);
}

int risk_state_size() { return (int)sizeof(RiskState); }

}  // extern "C"
