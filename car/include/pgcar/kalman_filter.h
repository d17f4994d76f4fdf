// Kalman estimators for the steering-angle sensor stream.
//
// Same models as the reference (src/car/kalman_filter.cc): a generic
// D-dimensional update with scalar observations, a constant-velocity 1D
// filter, and a constant-acceleration 1D filter whose acceleration decays by
// 0.8 per step to reduce inertia (kalman_filter.cc:136-141).
#ifndef PGCAR_KALMAN_FILTER_H_
#define PGCAR_KALMAN_FILTER_H_

#include <cmath>

#include "pgcar/check.h"
#include "pgcar/matrix.h"
#include "pgcar/timestamped_history.h"

namespace pgcar {

namespace internal {

inline double TimevalDiffSeconds(const timeval &a, const timeval &b) {
  timeval d;
  timersub(&a, &b, &d);
  return static_cast<double>(d.tv_sec) + static_cast<double>(d.tv_usec) * 1e-6;
}

// One predict+correct step with scalar observation z:
//   x' = F x;  P' = F P F^T + G G^T
//   y = z - H x';  S = H P' H^T + r;  K = P' H^T / S
//   x = x' + K y;  P = (I - K H) P'
template <size_t D>
void KalmanUpdate(const Vector<D> &mean, const Matrix<D, D> &covariance,
                  const Matrix<D, D> &f, const Vector<D> &g,
                  const Matrix<1, D> &h, double observation,
                  double observation_variance, Vector<D> *next_mean,
                  Matrix<D, D> *next_covariance) {
  const Vector<D> predicted = f * mean;
  const Matrix<D, D> p_pred =
      f * covariance * f.Transposed() + g * g.Transposed();
  const double innovation = observation - (h * predicted)(0, 0);
  const double s = (h * p_pred * h.Transposed())(0, 0) + observation_variance;
  const Vector<D> gain = (p_pred * h.Transposed()) * (1.0 / s);
  *next_mean = predicted + gain * innovation;
  *next_covariance = (Matrix<D, D>::Identity() - gain * h) * p_pred;
}

}  // namespace internal

// 1D value tracker with a constant-velocity model; the process noise is a
// random constant acceleration over each step (G = [dt^2/2, dt] * sigma).
class KalmanFilter1D {
 public:
  struct Estimate {
    Vector<2> mean;        // [value, velocity]
    Matrix<2, 2> covariance;
  };

  KalmanFilter1D(double observation_variance,
                 double perturbation_variance_per_second)
      : observation_variance_(observation_variance),
        noise_sigma_(std::sqrt(perturbation_variance_per_second)) {
    PG_CHECK_GT(observation_variance_, 0);
    PG_CHECK_GT(noise_sigma_, 0);
    h_(0, 0) = 1.0;
  }

  void Update(const Timestamped<double> &observation) {
    Estimate next;
    if (!has_estimate_) {
      next.mean(0, 0) = observation.data();
      next.covariance = Matrix<2, 2>::Identity();
      has_estimate_ = true;
    } else {
      const double dt = internal::TimevalDiffSeconds(
          observation.timestamp(), latest_.timestamp());
      Matrix<2, 2> f = Matrix<2, 2>::Identity();
      f(0, 1) = dt;
      Vector<2> g;
      g(0, 0) = 0.5 * dt * dt * noise_sigma_;
      g(1, 0) = dt * noise_sigma_;
      internal::KalmanUpdate(latest_.data().mean, latest_.data().covariance, f,
                             g, h_, observation.data(), observation_variance_,
                             &next.mean, &next.covariance);
    }
    latest_ = {next, observation.timestamp()};
  }

  const Timestamped<Estimate> &LatestEstimate() const {
    PG_CHECK(has_estimate_);
    return latest_;
  }

 private:
  const double observation_variance_;
  const double noise_sigma_;
  Matrix<1, 2> h_;
  bool has_estimate_ = false;
  Timestamped<Estimate> latest_;
};

// 1D tracker with value/velocity/acceleration state; the acceleration
// diagonal is 0.8 to damp acceleration inertia.
class KalmanFilter1D2Order {
 public:
  static constexpr double kAccelerationDecay = 0.8;

  struct Estimate {
    Vector<3> mean;        // [value, velocity, acceleration]
    Matrix<3, 3> covariance;
  };

  KalmanFilter1D2Order(double observation_variance,
                       double perturbation_variance_per_second)
      : observation_variance_(observation_variance),
        noise_sigma_(std::sqrt(perturbation_variance_per_second)) {
    PG_CHECK_GT(observation_variance_, 0);
    PG_CHECK_GT(noise_sigma_, 0);
    h_(0, 0) = 1.0;
  }

  void Update(const Timestamped<double> &observation) {
    Estimate next;
    if (!has_estimate_) {
      next.mean(0, 0) = observation.data();
      next.covariance = Matrix<3, 3>::Identity();
      has_estimate_ = true;
    } else {
      const double dt = internal::TimevalDiffSeconds(
          observation.timestamp(), latest_.timestamp());
      Matrix<3, 3> f;
      f(0, 0) = 1.0;
      f(0, 1) = dt;
      f(0, 2) = 0.5 * dt * dt;
      f(1, 1) = 1.0;
      f(1, 2) = dt;
      f(2, 2) = kAccelerationDecay;
      Vector<3> g;
      g(0, 0) = dt * dt * dt / 6.0 * noise_sigma_;
      g(1, 0) = 0.5 * dt * dt * noise_sigma_;
      g(2, 0) = dt * noise_sigma_;
      internal::KalmanUpdate(latest_.data().mean, latest_.data().covariance, f,
                             g, h_, observation.data(), observation_variance_,
                             &next.mean, &next.covariance);
    }
    latest_ = {next, observation.timestamp()};
  }

  const Timestamped<Estimate> &LatestEstimate() const {
    PG_CHECK(has_estimate_);
    return latest_;
  }

 private:
  const double observation_variance_;
  const double noise_sigma_;
  Matrix<1, 3> h_;
  bool has_estimate_ = false;
  Timestamped<Estimate> latest_;
};

}  // namespace pgcar

#endif  // PGCAR_KALMAN_FILTER_H_
