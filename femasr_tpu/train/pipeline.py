"""Training & testing pipelines (the reference's basicsr/train.py:107 and
basicsr/test.py:11 re-built for the JAX runtime)."""

from __future__ import annotations

import datetime
import logging
import math
import time
from os import path as osp

from ..data import EnlargedSampler, build_dataloader, build_dataset
from ..parallel.mesh import is_main_process
from ..utils import (AvgTimer, MessageLogger, check_resume, copy_opt_file,
                     dict2str, get_env_info, get_root_logger, get_time_str,
                     init_tb_logger, init_wandb_logger, make_exp_dirs,
                     mkdir_and_rename, parse_options, scandir)


def init_tb_loggers(opt):
    if (opt['logger'].get('wandb') is not None
            and opt['logger']['wandb'].get('project') is not None
            and 'debug' not in opt['name']):
        assert opt['logger'].get('use_tb_logger') is True, \
            'should turn on tensorboard when using wandb'
        init_wandb_logger(opt)
    tb_logger = None
    if opt['logger'].get('use_tb_logger') and 'debug' not in opt['name'] \
            and is_main_process():
        try:
            tb_logger = init_tb_logger(
                log_dir=osp.join(opt['root_path'], 'tb_logger', opt['name']))
        except Exception as e:  # tensorboard optional
            get_root_logger().warning(f'tensorboard unavailable: {e}')
    return tb_logger


def create_train_val_dataloader(opt, logger):
    """Reference train.py:45-81."""
    train_loader, val_loader = None, None
    train_sampler = None
    total_epochs = total_iters = 0
    for phase, dataset_opt in opt['datasets'].items():
        if phase == 'train':
            dataset_enlarge_ratio = dataset_opt.get('dataset_enlarge_ratio', 1)
            train_set = build_dataset(dataset_opt)
            train_sampler = EnlargedSampler(
                len(train_set), opt['world_size'], opt['rank'],
                dataset_enlarge_ratio)
            train_loader = build_dataloader(
                train_set, dataset_opt, num_gpu=opt['num_gpu'],
                dist=opt['dist'], sampler=train_sampler,
                seed=opt['manual_seed'])

            num_iter_per_epoch = math.ceil(
                len(train_set) * dataset_enlarge_ratio
                / (dataset_opt['batch_size_per_gpu'] * opt['world_size']))
            total_iters = int(opt['train']['total_iter'])
            total_epochs = math.ceil(total_iters / num_iter_per_epoch)
            logger.info('Training statistics:'
                        f'\n\tNumber of train images: {len(train_set)}'
                        f'\n\tBatch size per device group: '
                        f"{dataset_opt['batch_size_per_gpu']}"
                        f'\n\tWorld size: {opt["world_size"]}'
                        f'\n\tRequire iter per epoch: {num_iter_per_epoch}'
                        f'\n\tTotal epochs: {total_epochs}; '
                        f'iters: {total_iters}.')
        elif phase == 'val':
            val_set = build_dataset(dataset_opt)
            val_loader = build_dataloader(val_set, dataset_opt,
                                          num_gpu=opt['num_gpu'],
                                          dist=opt['dist'])
            logger.info('Number of val images/folders in '
                        f'{dataset_opt["name"]}: {len(val_set)}')
        else:
            raise ValueError(f'Dataset phase {phase} is not recognized.')
    return train_loader, train_sampler, val_loader, total_epochs, total_iters


def load_resume_state(opt):
    """Auto-resume: newest training_states/*.state (train.py:84-104)."""
    resume_state_path = None
    if opt['auto_resume']:
        state_path = osp.join(opt['root_path'], 'experiments', opt['name'],
                              'training_states')
        if osp.isdir(state_path):
            states = [v for v in scandir(state_path, suffix='.state',
                                         recursive=False)]
            if len(states) != 0:
                states = [float(v.split('.state')[0]) for v in states]
                resume_state_path = osp.join(state_path,
                                             f'{max(states):.0f}.state')
                opt['path']['resume_state'] = resume_state_path
    else:
        if opt['path'].get('resume_state'):
            resume_state_path = opt['path']['resume_state']
    if resume_state_path is None:
        return None
    from ..utils.checkpoint import load_pytree
    head = load_pytree(resume_state_path)
    check_resume(opt, int(head['iter']))
    return resume_state_path


def train_pipeline(root_path: str, argv=None):
    opt, args = parse_options(root_path, is_train=True, argv=argv)
    opt['root_path'] = root_path

    resume_state_path = load_resume_state(opt)
    if resume_state_path is None:
        make_exp_dirs(opt)
        if (opt['logger'].get('use_tb_logger') and 'debug' not in opt['name']
                and is_main_process()):
            mkdir_and_rename(osp.join(root_path, 'tb_logger', opt['name']))
    copy_opt_file(args.opt, opt['path']['experiments_root'])

    log_file = osp.join(opt['path']['log'],
                        f"train_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))
    tb_logger = init_tb_loggers(opt)

    result = create_train_val_dataloader(opt, logger)
    train_loader, train_sampler, val_loader, total_epochs, total_iters = result

    from . import build_model
    model = build_model(opt)

    if resume_state_path:
        resumed = model.resume_training(resume_state_path)
        start_epoch, current_iter = resumed['epoch'], resumed['iter']
        logger.info(f"Resuming training from epoch: {start_epoch}, "
                    f"iter: {current_iter}.")
    else:
        start_epoch, current_iter = 0, 0

    msg_logger = MessageLogger(opt, current_iter, tb_logger)
    logger.info(f'Start training from epoch: {start_epoch}, '
                f'iter: {current_iter}')
    data_timer, iter_timer = AvgTimer(), AvgTimer()
    start_time = time.time()

    # device prefetch: batch N+1's host->device copy overlaps step N's
    # async dispatch (FeMaSRModel wraps with data.loader.DevicePrefetcher)
    fetch_loader = model.wrap_loader(train_loader)

    # chain_steps > 1: run K steps per dispatch via lax.scan
    # (optimize_parameters_chained) — amortizes per-dispatch overhead on
    # dispatch-bound hosts and removes K-1 host syncs per chain. Per-iter
    # housekeeping runs once per chain; a frequency "fires" when a chain
    # crosses any multiple of it (rounded to chain boundaries).
    chain_steps = max(1, int(opt['train'].get('chain_steps', 1) or 1))
    pending_chain = []

    def crossed(freq, lo, hi):
        """True iff a multiple of freq lies in (lo, hi]."""
        freq = int(freq)
        return freq > 0 and hi // freq > lo // freq

    profiling = False

    epoch = start_epoch
    while current_iter <= total_iters:
        train_sampler.set_epoch(epoch)
        for train_data in fetch_loader:
            data_timer.record()
            if chain_steps > 1:
                pending_chain.append(train_data)
                if (len(pending_chain) < chain_steps
                        and current_iter + len(pending_chain) < total_iters):
                    continue
            prev_iter = current_iter
            current_iter += max(len(pending_chain), 1)
            if current_iter > total_iters:
                pending_chain = []
                break

            # jax.profiler trace window (observability parity, SURVEY.md §5;
            # the reference has only AvgTimer — this captures full XLA traces)
            prof_start = opt['logger'].get('profile_start_iter')
            if prof_start is not None and prev_iter < int(prof_start) \
                    <= current_iter:
                import jax
                jax.profiler.start_trace(
                    osp.join(opt['path']['log'], 'jax_trace'))
                profiling = True
            if pending_chain:
                model.optimize_parameters_chained(pending_chain)
                pending_chain = []
            else:
                model.feed_data(train_data)
                model.optimize_parameters(current_iter)
            if profiling and prof_start is not None and current_iter >= (
                    int(prof_start)
                    + int(opt['logger'].get('profile_steps', 5)) - 1):
                import jax
                jax.profiler.stop_trace()
                logger.info('jax profiler trace written to '
                            f"{osp.join(opt['path']['log'], 'jax_trace')}")
                opt['logger']['profile_start_iter'] = None
                profiling = False
            iter_timer.record(steps=current_iter - prev_iter)
            if prev_iter == 0:
                msg_logger.reset_start_time()

            if crossed(opt['logger']['print_freq'], prev_iter, current_iter):
                log_vars = {'epoch': epoch, 'iter': current_iter,
                            'lrs': model.get_current_learning_rate(),
                            'time': iter_timer.get_avg_time(),
                            'data_time': data_timer.get_avg_time()}
                log_vars.update(model.get_current_log())
                msg_logger(log_vars)

            if tb_logger is not None and crossed(
                    opt['logger'].get('show_tf_imgs_freq', 1e99),
                    prev_iter, current_iter):
                visuals = model.get_current_visuals()
                for k, v in visuals.items():
                    imgs = v.clip(0, 1).astype('float32')
                    tb_logger.add_images(f'samples/{k}', imgs, current_iter,
                                         dataformats='NHWC')

            if crossed(opt['logger'].get('save_checkpoint_freq', 1e99),
                       prev_iter, current_iter):
                logger.info('Saving models and training states.')
                model.save(epoch, current_iter)
            if crossed(opt['logger'].get('save_latest_freq', 1e99),
                       prev_iter, current_iter):
                logger.info('Saving latest models and training states.')
                model.save(epoch, -1)

            if (opt.get('val') is not None and val_loader is not None
                    and crossed(int(opt['val']['val_freq']),
                                prev_iter, current_iter)):
                model.validation(val_loader, current_iter, tb_logger,
                                 opt['val'].get('save_img', False))

            data_timer.start()
            iter_timer.start()
        epoch += 1

    consumed_time = str(datetime.timedelta(seconds=int(time.time()
                                                       - start_time)))
    logger.info(f'End of training. Time consumed: {consumed_time}')
    logger.info('Save the latest model.')
    model.save(epoch=-1, current_iter=-1)
    if (opt.get('val') is not None and val_loader is not None):
        model.validation(val_loader, current_iter, tb_logger,
                         opt['val'].get('save_img', False))
    if tb_logger:
        tb_logger.close()
    return model


def test_pipeline(root_path: str, argv=None):
    """Offline evaluation over test datasets (reference test.py:11-45)."""
    opt, _ = parse_options(root_path, is_train=False, argv=argv)
    opt['root_path'] = root_path

    make_exp_dirs(opt)
    log_file = osp.join(opt['path']['log'],
                        f"test_{opt['name']}_{get_time_str()}.log")
    logger = get_root_logger(log_level=logging.INFO, log_file=log_file)
    logger.info(get_env_info())
    logger.info(dict2str(opt))

    test_loaders = []
    for _, dataset_opt in sorted(opt['datasets'].items()):
        test_set = build_dataset(dataset_opt)
        test_loader = build_dataloader(test_set, dataset_opt,
                                       num_gpu=opt['num_gpu'])
        logger.info(f"Number of test images in {dataset_opt['name']}: "
                    f'{len(test_set)}')
        test_loaders.append(test_loader)

    from . import build_model
    model = build_model(opt)

    for test_loader in test_loaders:
        test_set_name = test_loader.dataset.opt['name']
        logger.info(f'Testing {test_set_name}...')
        model.validation(test_loader, current_iter=opt['name'],
                         tb_logger=None,
                         save_img=opt['val'].get('save_img', True))
    return model
