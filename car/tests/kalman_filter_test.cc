#include "pgcar/kalman_filter.h"

#include "pgcar/testing.h"

using pgcar::KalmanFilter1D;
using pgcar::KalmanFilter1D2Order;
using pgcar::Timestamped;

namespace {
timeval T(long sec, long usec) { return {sec, usec}; }
}  // namespace

TEST(KalmanFilter1D, EstimateBeforeUpdateDies) {
  EXPECT_DEATH({
    KalmanFilter1D filter(1.0, 1.0);
    filter.LatestEstimate();
  });
}

TEST(KalmanFilter1D, InvalidConstructorArgsDie) {
  EXPECT_DEATH({ KalmanFilter1D filter(0.0, 1.0); });
  EXPECT_DEATH({ KalmanFilter1D filter(1.0, -1.0); });
}

TEST(KalmanFilter1D, FirstMeasurementIsIdentity) {
  KalmanFilter1D filter(2.0, 1.0);
  filter.Update({7.5, T(10, 0)});
  const auto &estimate = filter.LatestEstimate();
  EXPECT_NEAR(estimate.data().mean(0, 0), 7.5, 1e-12);
  EXPECT_NEAR(estimate.data().mean(1, 0), 0.0, 1e-12);
  // Covariance initialized to identity.
  EXPECT_NEAR(estimate.data().covariance(0, 0), 1.0, 1e-12);
  EXPECT_NEAR(estimate.data().covariance(1, 1), 1.0, 1e-12);
  EXPECT_NEAR(estimate.data().covariance(0, 1), 0.0, 1e-12);
}

TEST(KalmanFilter1D, TwoMeasurementsMatchClosedForm) {
  // Hand derivation for observation variance r, noise variance q, step dt:
  //   after update 1: x = [z0, 0], P = I
  //   predict: F = [[1, dt], [0, 1]], G = sqrt(q) * [dt^2/2, dt]
  //     x' = [z0, 0]
  //     P' = F I F^T + G G^T
  //        = [[1 + dt^2 + q dt^4/4,  dt + q dt^3/2],
  //           [dt + q dt^3/2,        1 + q dt^2   ]]
  //   correct with z1: y = z1 - z0, S = P'[0][0] + r, K = P'[:,0] / S
  //     x = [z0 + K0 y, K1 y]
  //     P = (I - K [1, 0]) P'
  const double r = 2.0, q = 3.0, dt = 0.5;
  const double z0 = 1.0, z1 = 4.0;

  KalmanFilter1D filter(r, q);
  filter.Update({z0, T(100, 0)});
  filter.Update({z1, T(100, 500000)});
  const auto &estimate = filter.LatestEstimate().data();

  const double p00 = 1 + dt * dt + q * dt * dt * dt * dt / 4.0;
  const double p01 = dt + q * dt * dt * dt / 2.0;
  const double p11 = 1 + q * dt * dt;
  const double y = z1 - z0;
  const double s = p00 + r;
  const double k0 = p00 / s;
  const double k1 = p01 / s;

  EXPECT_NEAR(estimate.mean(0, 0), z0 + k0 * y, 1e-12);
  EXPECT_NEAR(estimate.mean(1, 0), k1 * y, 1e-12);
  EXPECT_NEAR(estimate.covariance(0, 0), (1 - k0) * p00, 1e-12);
  EXPECT_NEAR(estimate.covariance(0, 1), (1 - k0) * p01, 1e-12);
  EXPECT_NEAR(estimate.covariance(1, 0), -k1 * p00 + p01, 1e-12);
  EXPECT_NEAR(estimate.covariance(1, 1), -k1 * p01 + p11, 1e-12);
}

TEST(KalmanFilter1D, ConvergesToConstantSignal) {
  KalmanFilter1D filter(1.0, 0.01);
  for (int i = 0; i < 100; ++i) {
    filter.Update({5.0, T(i, 0)});
  }
  const auto &estimate = filter.LatestEstimate().data();
  EXPECT_NEAR(estimate.mean(0, 0), 5.0, 1e-6);
  EXPECT_NEAR(estimate.mean(1, 0), 0.0, 1e-6);
}

TEST(KalmanFilter1D2Order, TracksLinearRamp) {
  // A constant-velocity signal: the 2nd-order filter should recover both
  // value and slope.
  KalmanFilter1D2Order filter(0.01, 100.0);
  for (int i = 0; i < 200; ++i) {
    const double t = i * 0.1;
    filter.Update({2.0 * t + 1.0, T(i / 10, (i % 10) * 100000)});
  }
  const auto &estimate = filter.LatestEstimate().data();
  EXPECT_NEAR(estimate.mean(0, 0), 2.0 * 19.9 + 1.0, 0.05);
  EXPECT_NEAR(estimate.mean(1, 0), 2.0, 0.1);
}

TEST(KalmanFilter1D2Order, AccelerationDecayInDynamics) {
  // With huge observation variance the correction is negligible, so the
  // acceleration component evolves as a *= 0.8 per step.
  KalmanFilter1D2Order filter(1e12, 1e-6);
  filter.Update({0.0, T(0, 0)});
  // Covariance starts as identity; acceleration mean starts at 0, so probe
  // the dynamics through the covariance: after one nearly-uncorrected step,
  // P[2][2] ~= 0.8^2 * 1.0.
  filter.Update({0.0, T(1, 0)});
  const auto &estimate = filter.LatestEstimate().data();
  EXPECT_NEAR(estimate.covariance(2, 2), 0.64, 1e-6);
}

PGTEST_MAIN()
